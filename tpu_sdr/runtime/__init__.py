from tpu_sdr.runtime.state import StreamState  # noqa: F401
from tpu_sdr.runtime.stream import SpectrumPipeline  # noqa: F401
from tpu_sdr.runtime.feeder import StreamFeeder  # noqa: F401
from tpu_sdr.runtime.psd import WelchPSD  # noqa: F401
from tpu_sdr.runtime.recorder import RecordingSource, SampleRecorder  # noqa: F401
from tpu_sdr.runtime.receiver import Receiver, ReceiverBank, write_wav  # noqa: F401
from tpu_sdr.runtime.scanner import SpectrumScanner  # noqa: F401
