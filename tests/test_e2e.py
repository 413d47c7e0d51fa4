"""Full-system end-to-end: analyzer -> wire frames -> UDP -> GUI decode.

The complete reference data path (SURVEY.md §3.3) in one test: command bytes
drive the analyzer, spectra leave as 64x1025-byte datagrams over a real
loopback socket, a GUI-style receiver reassembles and decodes, and the
decoded magnitudes match the analyzer's own output to wire (int16)
quantization.
"""

import time

import numpy as np
import pytest

from tpu_sdr.control import SpectrumAnalyzer, design_iir_filter, golden
from tpu_sdr.control.commands import Command, encode_coefficient_upload
from tpu_sdr.core.config import PipelineConfig
from tpu_sdr.transport.udp_stream import UdpSpectrumReceiver, UdpSpectrumSender


def test_full_chain_commands_to_decoded_spectra():
    got = []
    rx = UdpSpectrumReceiver(
        port=0, bind_ip="127.0.0.1", fps_cap=1e9,
        on_frame=lambda re, im, mag: got.append(mag.copy()),
    )
    rx.start()
    tx = UdpSpectrumSender("127.0.0.1", rx.port)

    sa = SpectrumAnalyzer(
        PipelineConfig(channels=1),
        on_spectrum=lambda mag, idx: tx.send_spectrum(
            mag, np.zeros_like(mag), scale=1.0
        ),
    )
    # wire-driven session: bypass + start, then designed LP + custom mode
    sa.handle_bytes(bytes([Command.MODE_BYPASS, Command.START]))
    x = golden.synth_tone(100e3, 16384).astype(np.float32)[None, :]
    out_bypass = sa.process(x)

    d = design_iir_filter("butterworth", "lowpass", 4, 1e6, 50e3)
    sa.handle_bytes(encode_coefficient_upload(d.to_wire_bytes()))
    sa.handle_bytes(bytes([Command.MODE_CUSTOM]))
    out_custom = sa.process(x)

    deadline = time.time() + 10
    while len(got) < 2 and time.time() < deadline:
        time.sleep(0.02)
    rx.stop()
    tx.close()

    assert len(got) == 2, f"got {len(got)} frames over UDP"
    # decoded wire frames match the analyzer's own magnitudes to int16 LSB
    direct_bypass = np.asarray(out_bypass["magnitude"])[0, 0]
    direct_custom = np.asarray(out_custom["magnitude"])[0, 0]
    # wire carries int16 re/im; with imag=0 the decoded magnitude is
    # |round(mag)| -> within 0.5 of the direct value
    assert np.abs(got[0] - np.abs(np.rint(direct_bypass))).max() <= 0.5
    assert np.abs(got[1] - np.abs(np.rint(direct_custom))).max() <= 0.5
    # and the filter actually acted over the wire
    assert got[1][1638] < 0.05 * got[0][1638]
    assert rx.frames_received == 2


def test_checkpoint_roundtrip_through_files(tmp_path):
    """Checkpoint/resume through an actual file (SURVEY.md §5.4)."""
    import json

    sa = SpectrumAnalyzer(PipelineConfig(channels=1))
    sa.handle_bytes(bytes([Command.START, Command.MODE_CUSTOM]))
    import scipy.signal as sps

    sa.upload_filter(sps.ellip(10, 0.5, 60, 0.3, output="sos"))
    rng = np.random.default_rng(5)
    x1 = rng.standard_normal((1, 16384)).astype(np.float32)
    x2 = rng.standard_normal((1, 16384)).astype(np.float32)
    sa.process(x1)

    ckpt = sa.checkpoint()
    p = tmp_path / "ckpt.npz"
    state = ckpt.pop("state")
    np.savez(p, **{k: v for k, v in state.items() if v is not None})
    (tmp_path / "meta.json").write_text(json.dumps(ckpt))

    meta = json.loads((tmp_path / "meta.json").read_text())
    loaded = dict(np.load(p))
    meta["state"] = {
        "sos_state": loaded["sos_state"],
        "window_phase": loaded["window_phase"],
        "frame_count": loaded["frame_count"],
        "history": loaded.get("history"),
    }
    sb = SpectrumAnalyzer(PipelineConfig(channels=1))
    sb.restore(meta)
    out_a = sa.process(x2)
    out_b = sb.process(x2)
    assert np.array_equal(
        np.asarray(out_a["magnitude"]), np.asarray(out_b["magnitude"])
    )
    assert int(sb.state.frame_count) == int(sa.state.frame_count)


def test_checkpoint_roundtrips_uart_streaming():
    """An armed 0xA5 DATA_REQ stream survives checkpoint/restore like the
    rest of the command-plane state (review finding: it used to reset to
    False, so a resumed UART session forgot the host's data request)."""
    sa = SpectrumAnalyzer(PipelineConfig(channels=1))
    sa.handle_bytes(bytes([Command.COMM_UART, Command.START, Command.DATA_REQ]))
    assert sa.uart_streaming
    sb = SpectrumAnalyzer(PipelineConfig(channels=1))
    sb.restore(sa.checkpoint())
    assert sb.uart_streaming
    assert sb.comm_mode == sa.comm_mode and sb.running


def test_failed_first_chunk_does_not_poison_stream_kind():
    """Review finding: the stream-kind latch (and IQ state swap) committed
    BEFORE pipe.process validated the chunk, so a rejected first chunk
    permanently fixed the kind and forced a spurious reset."""
    sa = SpectrumAnalyzer(PipelineConfig(channels=1))
    sa.start()
    with pytest.raises(ValueError, match="multiple of"):
        sa.process(np.zeros(100, np.float32))  # bad length, rejected
    # the kind is still undetermined: a valid IQ first chunk must work
    iq = np.zeros(16384, np.complex64)
    out = sa.process(iq)
    assert out is not None and sa._complex_stream is True


def test_checkpoint_preserves_undetermined_stream_kind():
    """Review finding: restore() inferred the stream kind from the state
    shape, collapsing 'not yet fixed' (None) to real — a restored
    not-yet-streaming analyzer then rejected IQ input the original would
    have accepted."""
    sa = SpectrumAnalyzer(PipelineConfig(channels=1))
    sa.start()
    ck = sa.checkpoint()
    sb = SpectrumAnalyzer(PipelineConfig(channels=1))
    sb.restore(ck)
    out = sb.process(np.zeros(16384, np.complex64))  # IQ first chunk: OK
    assert out is not None and sb._complex_stream is True


def test_successful_upload_clears_stale_rejection():
    """Review finding: last_upload_error persisted after a later
    successful upload, reporting the working filter as rejected."""
    import scipy.signal as sps

    sa = SpectrumAnalyzer(PipelineConfig(channels=1))
    # wire path: 0xF1 + 12 bytes decoding to poles outside the unit circle
    sa.handle_bytes(bytes([0xF1]) + bytes([64, 0, 0, 64, 127, 127]) * 2)
    assert sa.stats.uploads_rejected >= 1
    assert sa.last_upload_error is not None
    sa.upload_filter(sps.butter(4, 0.2, output="sos"))
    assert sa.last_upload_error is None
