from tpu_sdr.shard.mesh import make_sdr_mesh  # noqa: F401
from tpu_sdr.shard.pipeline import ShardedSpectrumPipeline  # noqa: F401
from tpu_sdr.shard.latency import LatencyPipeline  # noqa: F401
from tpu_sdr.shard.channelizer import ShardedChannelizer  # noqa: F401
from tpu_sdr.shard.psd import ShardedWelchPSD  # noqa: F401
from tpu_sdr.shard.ddc import ShardedDDC  # noqa: F401
from tpu_sdr.shard.ddcbank import ShardedDDCBank  # noqa: F401
from tpu_sdr.shard.demod import (  # noqa: F401
    ShardedAGC,
    ShardedAMDemodulator,
    ShardedFMDemodulator,
    ShardedSquelch,
    ShardedSSBDemodulator,
)
from tpu_sdr.shard.resample import ShardedResampler  # noqa: F401
from tpu_sdr.shard.fastconv import ShardedFastFIR  # noqa: F401
from tpu_sdr.shard.receiver import (  # noqa: F401
    ShardedReceiver,
    ShardedReceiverBank,
)
from tpu_sdr.shard.stereo import ShardedStereoDecoder  # noqa: F401
