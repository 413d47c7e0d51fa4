"""The full tune-to-audio chain over the (channel, time) mesh.

Composes the sharded stages — ``ShardedDDC`` (mixed-tail halo),
sharded demod/AGC (one-sample halo + replicated affine-chain replay),
``ShardedStereoDecoder`` (2-float block-phasor halo + replicated pilot
EMA replay, stereo=True receivers), ``ShardedResampler`` (input-tail
halo) — into one streaming receiver whose audio is BITWISE identical to
the single-device ``Receiver`` for every mesh shape (tested in
tests/test_shard_receiver.py). Data stays (channel, time)-sharded on
device between stages; only the per-stage carried state (a few floats
per channel) is replicated.
"""

from __future__ import annotations

import jax

from tpu_sdr.kernels.demod import AMDemodulator, FMDemodulator, SSBDemodulator
from tpu_sdr.runtime.receiver import Receiver, ReceiverBank, ReceiverState
from tpu_sdr.shard.ddc import ShardedDDC
from tpu_sdr.shard.ddcbank import ShardedDDCBank
from tpu_sdr.shard.demod import (
    ShardedAGC,
    ShardedAMDemodulator,
    ShardedFMDemodulator,
    ShardedSquelch,
    ShardedSSBDemodulator,
)
from tpu_sdr.shard.resample import ShardedResampler
from tpu_sdr.shard.stereo import ShardedStereoDecoder


class _ShardedAudioChain:
    """The post-DDC stages (demod -> stereo -> AGC -> squelch ->
    resample) over the mesh, shared by ``ShardedReceiver`` (one station
    per channel row) and ``ShardedReceiverBank`` (one station per
    CARRIER row of a shared stream) — both feed (rows, T) baseband
    planes, so the chain is identical."""

    def __init__(self, rx: Receiver, mesh: jax.sharding.Mesh):
        if isinstance(rx.demod, FMDemodulator):
            self.demod = ShardedFMDemodulator(rx.demod, mesh)
        elif isinstance(rx.demod, AMDemodulator):
            self.demod = ShardedAMDemodulator(rx.demod, mesh)
        elif isinstance(rx.demod, SSBDemodulator):
            self.demod = ShardedSSBDemodulator(rx.demod, mesh)
        else:  # pragma: no cover - future demod kinds
            raise TypeError(f"unsupported demod {type(rx.demod).__name__}")
        self.stereo_dec = (None if rx.stereo_dec is None
                           else ShardedStereoDecoder(rx.stereo_dec, mesh))
        self.agc = None if rx.agc is None else ShardedAGC(rx.agc, mesh)
        self.squelch = (None if rx.squelch is None
                        else ShardedSquelch(rx.squelch, mesh))
        self.resampler = ShardedResampler(rx.resampler, mesh)

    def run(self, bb, state: ReceiverState, ddc_state):
        audio, dm = self.demod.process(bb["re"], bb["im"], state.demod)
        st_state = state.stereo
        if self.stereo_dec is not None:
            audio, st_state = self.stereo_dec.process(audio, state.stereo)
        agc_state = state.agc
        if self.agc is not None:
            audio, agc_state = self.agc.process_real(audio, state.agc)
        sq_state = state.squelch
        if self.squelch is not None:
            gate, sq_state = self.squelch.gates(
                bb["re"], bb["im"], state.squelch)
            if self.stereo_dec is not None:
                gate = gate[..., None, :]  # broadcast over the (L, R) axis
            audio = audio * gate
        audio, rs = self.resampler.process(audio, state.resamp)
        return audio, ReceiverState(
            ddc_state, dm, agc_state, rs, sq_state, st_state
        )


class ShardedReceiver:
    """``Receiver`` over a (channel, time) mesh. Input is (C, T) real
    wideband (or (2, C, T) IQ planes): C over the channel axis, T over
    time. Chunks must be multiples of ``chunk_granularity`` (the
    single-device granularity times the time-shard count)."""

    def __init__(self, rx: Receiver, mesh: jax.sharding.Mesh):
        self.rx = rx
        self.mesh = mesh
        self.ddc = ShardedDDC(rx.ddc, mesh)
        self._chain = _ShardedAudioChain(rx, mesh)
        self.chunk_granularity = mesh.shape["time"] * rx.chunk_granularity

    # stage handles (kept as public attributes for tests/introspection)
    @property
    def demod(self):
        return self._chain.demod

    @property
    def stereo_dec(self):
        return self._chain.stereo_dec

    @property
    def agc(self):
        return self._chain.agc

    @property
    def squelch(self):
        return self._chain.squelch

    @property
    def resampler(self):
        return self._chain.resampler

    @property
    def realized_audio_rate(self) -> float:
        return self.rx.realized_audio_rate

    def retune(self, center_hz: float):
        self.rx.retune(center_hz)

    def initial_state(self, batch_shape: tuple = ()) -> ReceiverState:
        return self.rx.initial_state(batch_shape)

    def _check(self, t: int):
        if t % self.chunk_granularity:
            raise ValueError(
                f"chunk length {t} not a multiple of "
                f"chunk_granularity={self.chunk_granularity}")

    def process(self, x, state: ReceiverState):
        """Real wideband (C, T) -> (audio (C, T'), state)."""
        self._check(x.shape[-1])
        bb, ds = self.ddc.process(x, state.ddc)
        return self._chain.run(bb, state, ds)

    def process_planes(self, xs, state: ReceiverState):
        """IQ wideband planes (2, C, T) -> (audio (C, T'), state)."""
        self._check(xs.shape[-1])
        bb, ds = self.ddc.process_planes(xs, state.ddc)
        return self._chain.run(bb, state, ds)


class ShardedReceiverBank:
    """``ReceiverBank`` over a (channel, time) mesh: K stations on ONE
    shared wideband stream — carriers over the channel axis (the
    ``ShardedDDCBank`` mix), time over the time axis, every later stage
    riding the same sharded chain as ``ShardedReceiver``. Audio is
    BITWISE identical to the single-device ``ReceiverBank`` for every
    mesh shape (tested). Input is (T,) real or (2, T) IQ; K must divide
    over the channel shards."""

    def __init__(self, bank: ReceiverBank, mesh: jax.sharding.Mesh):
        self.bankrx = bank
        self.mesh = mesh
        self.ddc = ShardedDDCBank(bank.bank, mesh)
        self._chain = _ShardedAudioChain(bank._rx, mesh)
        self.chunk_granularity = (
            mesh.shape["time"] * bank.chunk_granularity)

    @property
    def k(self) -> int:
        return self.bankrx.k

    @property
    def realized_audio_rate(self) -> float:
        return self.bankrx.realized_audio_rate

    def retune(self, centers_hz):
        self.bankrx.retune(centers_hz)

    def initial_state(self, batch_shape: tuple = ()) -> ReceiverState:
        return self.bankrx.initial_state(batch_shape)

    def _check(self, t: int):
        if t % self.chunk_granularity:
            raise ValueError(
                f"chunk length {t} not a multiple of "
                f"chunk_granularity={self.chunk_granularity}")

    def process(self, x, state: ReceiverState):
        """Real shared stream (T,) -> (audio (K, T'), state)."""
        self._check(x.shape[-1])
        bb, ds = self.ddc.process(x, state.ddc)
        return self._chain.run(bb, state, ds)

    def process_planes(self, xs, state: ReceiverState):
        """IQ shared stream (2, T) -> (audio (K, T'), state)."""
        self._check(xs.shape[-1])
        bb, ds = self.ddc.process_planes(xs, state.ddc)
        return self._chain.run(bb, state, ds)
