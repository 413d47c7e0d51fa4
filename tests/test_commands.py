"""Command protocol + designer wire format + SpectrumAnalyzer facade."""

import numpy as np
import pytest
import scipy.signal as sps

from tpu_sdr.control import (
    Command,
    CommandDecoder,
    SpectrumAnalyzer,
    design_iir_filter,
    sos_to_wire_bytes,
    wire_bytes_to_sos,
)
from tpu_sdr.control.commands import encode_coefficient_upload
from tpu_sdr.core.config import CommMode, FilterMode, PipelineConfig
from tpu_sdr.control import golden


def test_decoder_commands():
    d = CommandDecoder()
    evs = d.feed(bytes([0x55, 0xB1, 0xEF, 0x42]))
    kinds = [(e.kind, e.command) for e in evs]
    assert kinds == [
        ("command", Command.START),
        ("command", Command.MODE_BYPASS),
        ("command", Command.COMM_ETH),
        ("ignored", None),
    ]


def test_decoder_coefficient_shield():
    """During the 12 coefficient bytes, command bytes are data — the busy
    shield of rx_filter_coeff.vhd:40-66."""
    d = CommandDecoder()
    payload = bytes([0x55, 0xFF, 0xB1, 0x00, 0xA1, 0xEF, 1, 2, 3, 4, 5, 6])
    evs = d.feed(bytes([0xF1]) + payload + bytes([0x55]))
    assert len(evs) == 2
    assert evs[0].kind == "coefficients"
    assert evs[0].coefficients == payload
    assert evs[1].command == Command.START
    assert not d.busy


def test_decoder_partial_coefficient_stream():
    d = CommandDecoder()
    assert d.feed(bytes([0xF1, 1, 2, 3])) == []
    assert d.busy
    evs = d.feed(bytes(range(9)))
    assert evs[0].kind == "coefficients"
    assert evs[0].coefficients == bytes([1, 2, 3] + list(range(9)))


def test_wire_roundtrip_2_sections():
    design = design_iir_filter("butterworth", "lowpass", 4, 1e6, 100e3)
    wire = design.to_wire_bytes()
    assert len(wire) == 12
    sos_back = wire_bytes_to_sos(wire)
    # quantization error bounded by half an LSB of the x64 grid for
    # unclipped entries; |c| > 127/64 saturates (the reference's int8 format)
    clipped = np.abs(design.sos * 64) > 127
    err = np.abs(sos_back - design.sos)
    assert np.max(err[~clipped]) <= 0.5 / 64 + 1e-12
    assert np.all(np.abs(sos_back[clipped]) == 127 / 64)


def test_wire_pads_first_order_design():
    design = design_iir_filter("butterworth", "lowpass", 2, 1e6, 100e3)
    wire = sos_to_wire_bytes(design.sos)
    sos_back = wire_bytes_to_sos(wire)
    # second section must be identity
    assert np.allclose(sos_back[1], [1, 0, 0, 1, 0, 0])


def test_wire_rejects_high_order():
    design = design_iir_filter("elliptic", "lowpass", 8, 1e6, 100e3)
    with pytest.raises(ValueError, match="wire format"):
        sos_to_wire_bytes(design.sos)


def test_designer_kinds_and_validation():
    for kind in ("butterworth", "chebyshev1", "chebyshev2", "elliptic", "bessel"):
        d = design_iir_filter(kind, "lowpass", 4, 1e6, 150e3)
        w, mag = d.frequency_response()
        # passband ~0 dB, deep stopband by 2x cutoff
        assert mag[0] > -6.0
    with pytest.raises(ValueError, match="cutoff"):
        design_iir_filter("butterworth", "lowpass", 4, 1e6, 600e3)
    with pytest.raises(ValueError, match="band edges"):
        design_iir_filter("butterworth", "bandpass", 4, 1e6, (300e3, 100e3))
    with pytest.raises(ValueError, match="unknown filter kind"):
        design_iir_filter("brickwall", "lowpass", 4, 1e6, 100e3)


def test_analyzer_wire_protocol_end_to_end():
    """Drive the analyzer exactly as the FPGA host would: mode, start,
    coefficient upload over the wire, then samples."""
    sa = SpectrumAnalyzer(PipelineConfig(channels=1))
    # before start: samples ignored
    x = golden.synth_tone(100e3, 16384).astype(np.float32)[None, :]
    assert sa.process(x) is None

    sa.handle_bytes(bytes([Command.MODE_BYPASS, Command.START]))
    assert sa.running and sa.filter_mode == FilterMode.BYPASS
    out = sa.process(x)
    assert out is not None
    assert sa.stats.frames_produced == 1
    assert abs(sa.stats.last_peak_bin - 1638) <= 1

    # upload a lowpass at 50 kHz via the wire; tone at 100 kHz should drop
    design = design_iir_filter("butterworth", "lowpass", 4, 1e6, 50e3)
    sa.handle_bytes(encode_coefficient_upload(design.to_wire_bytes()))
    sa.handle_bytes(bytes([Command.MODE_CUSTOM]))
    assert sa.filter_mode == FilterMode.CUSTOM
    out2 = sa.process(x)
    mag_bypass = np.asarray(out["magnitude"])[0, 0]
    mag_filt = np.asarray(out2["magnitude"])[0, 0]
    assert mag_filt[1638] < 0.1 * mag_bypass[1638]
    assert sa.stats.coefficient_uploads == 1

    # reset: mode back to bypass, state cleared, coefficients survive
    sa.handle_bytes(bytes([Command.RESET]))
    assert not sa.running
    assert sa.filter_mode == FilterMode.BYPASS
    assert np.all(np.asarray(sa.state.sos_state) == 0)
    assert sa.custom_sos is not None


def test_analyzer_comm_mode_and_spectrum_hook():
    frames = []
    sa = SpectrumAnalyzer(
        PipelineConfig(channels=1),
        on_spectrum=lambda mag, idx: frames.append((idx, mag.shape)),
    )
    sa.handle_bytes(bytes([Command.COMM_UART, Command.START, Command.DATA_REQ]))
    assert sa.comm_mode == CommMode.UART and sa.uart_streaming
    x = np.random.default_rng(0).standard_normal((1, 2 * 16384)).astype(np.float32)
    sa.process(x)
    assert frames == [(0, (16384,)), (1, (16384,))]


def test_analyzer_checkpoint_resume():
    sa = SpectrumAnalyzer(PipelineConfig(channels=1))
    sa.handle_bytes(bytes([Command.START, Command.MODE_CUSTOM]))
    sa.upload_filter(sps.butter(8, 0.2, output="sos"))
    rng = np.random.default_rng(2)
    x1 = rng.standard_normal((1, 16384)).astype(np.float32)
    x2 = rng.standard_normal((1, 16384)).astype(np.float32)
    sa.process(x1)
    ckpt = sa.checkpoint()
    out_direct = sa.process(x2)

    sb = SpectrumAnalyzer(PipelineConfig(channels=1))
    sb.restore(ckpt)
    out_resumed = sb.process(x2)
    assert np.array_equal(
        np.asarray(out_direct["magnitude"]), np.asarray(out_resumed["magnitude"])
    )


def test_rejected_upload_does_not_abort_wire_buffer():
    """An unstable coefficient upload in the same write as 0x55 must not
    swallow the START (the FPGA accepts any 12 bytes; we record the
    rejection and keep decoding)."""
    sa = SpectrumAnalyzer(PipelineConfig(channels=1))
    # A1=127 (a1 ~ 1.98 with a2 ~ 1.98) -> poles outside the unit circle
    bad12 = bytes([64, 0, 0, 64, 127, 127, 64, 0, 0, 64, 0, 0])
    sa.handle_bytes(bytes([0xF1]) + bad12 + bytes([0x55]))
    assert sa.running, "START after a rejected upload was dropped"
    assert sa.stats.uploads_rejected == 1
    assert "unstable" in (sa.last_upload_error or "")
    # the custom bank is untouched (still identity / previous coefficients)
    assert sa.custom_sos is None


def test_bank_checkpoint_roundtrip(tmp_path):
    """Regression: a bank-configured analyzer's checkpoint was unrestorable
    (restore always dispatched to the single-cascade upload)."""
    import scipy.signal as sps

    C = 2
    sa = SpectrumAnalyzer(PipelineConfig(channels=C))
    sa.start()
    bank = [sps.butter(8, 0.15, output="sos"), sps.butter(8, 0.45, output="sos")]
    sa.upload_filter_bank(bank)
    sa.set_filter_mode(FilterMode.CUSTOM)
    x = np.random.default_rng(0).standard_normal((C, 16384)).astype(np.float32)
    sa.process(x)
    ck = sa.checkpoint()

    sa2 = SpectrumAnalyzer(PipelineConfig(channels=C))
    sa2.restore(ck)
    assert sa2.custom_sos is not None and sa2.custom_sos.ndim == 3
    # counters continue (frame indices must not repeat after resume)
    assert sa2.stats.frames_produced == sa.stats.frames_produced
    out = sa2.process(x)
    assert np.isfinite(np.asarray(out["magnitude"])).all()


def test_designer_band_cutoff_validation():
    """Review finding: a scalar cutoff for bandpass (or a tuple for
    lowpass) crashed with a raw unpack/float TypeError instead of the
    validation-style ValueError every other bad input gets."""
    from tpu_sdr.control import design_iir_filter

    with pytest.raises(ValueError, match="two cutoff"):
        design_iir_filter(btype="bandpass", cutoff_hz=100e3)
    with pytest.raises(ValueError, match="single cutoff"):
        design_iir_filter(btype="lowpass", cutoff_hz=(1e3, 2e3))
