"""Drop-in proof: the reference's OWN host code consumes our wire output.

These tests execute the reference GUI's actual ``MultiPacketAssembler`` and
magnitude/IQ decode math (extracted from
``/root/reference/scripts/fft_analyzer_gui.py:250-270,308-352`` via the
vetted AST loader in ``reference_host.py``) against packets produced by our
framer — in order, shuffled, and under loss with eviction. If these pass, a
GUI written against the FPGA reassembles and decodes our frames unchanged.

Also here: the wire-amplitude golden test — a full-scale tone pushed through
the Q15 integer pipeline lands on the wire at the level the xfft default
scaling schedule predicts, as seen by the reference's own decode.
"""

import os

import numpy as np
import pytest

from reference_host import load_reference_host
from tpu_sdr.transport import native
from tpu_sdr.transport.framing import (
    FRAME_SIZE_BYTES,
    PACKETS_PER_FRAME,
    XFFT_WIRE_SCALE,
    MultiPacketAssembler,
    decode_frame,
    frame_bytes_from_q15,
    frame_to_packets,
    spectrum_to_frame_bytes,
)


@pytest.fixture(scope="module")
def ref():
    if not os.path.exists("/root/reference/scripts/fft_analyzer_gui.py"):
        pytest.skip("reference tree not present")
    return load_reference_host()


def _spectrum(seed=0):
    rng = np.random.default_rng(seed)
    re = (rng.standard_normal(16384) * 1000).astype(np.float32)
    im = (rng.standard_normal(16384) * 1000).astype(np.float32)
    return re, im


def _ref_asm(ref, evict_ms=3000):
    return ref.MultiPacketAssembler(
        ref.PACKETS_PER_FRAME, ref.PACKET_DATA_SIZE, evict_ms=evict_ms
    )


def test_wire_constants_match_reference(ref):
    assert ref.FRAME_SIZE_BYTES == FRAME_SIZE_BYTES == 65536
    assert ref.PACKETS_PER_FRAME == PACKETS_PER_FRAME == 64
    assert ref.ETHERNET_PAYLOAD_SIZE == 1025
    assert ref.FFT_SIZE == 16384 and ref.FS_HZ == 1_000_000.0


def test_reference_reassembles_our_frames_in_order(ref):
    re, im = _spectrum(1)
    frame = spectrum_to_frame_bytes(re, im)
    asm = _ref_asm(ref)
    out = None
    for p in frame_to_packets(frame):
        assert out is None
        out = asm.add(p, now_ms=0)
    assert out == frame


def test_reference_reassembles_shuffled_packets(ref):
    re, im = _spectrum(2)
    frame = spectrum_to_frame_bytes(re, im)
    pkts = frame_to_packets(frame)
    order = np.random.default_rng(7).permutation(len(pkts))
    asm = _ref_asm(ref)
    outs = [asm.add(pkts[i], now_ms=j) for j, i in enumerate(order)]
    assert outs[:-1] == [None] * (len(pkts) - 1)
    assert outs[-1] == frame


def test_reference_decode_matches_ours_bitwise(ref):
    re, im = _spectrum(3)
    frame = spectrum_to_frame_bytes(re, im)
    mag_ref = ref.decode_mag_16iq_le(frame)
    re_ref, im_ref = ref.decode_iq_components(frame)
    re2, im2, mag2 = decode_frame(frame)
    assert np.array_equal(mag_ref, mag2)
    assert np.array_equal(re_ref, re2)
    assert np.array_equal(im_ref, im2)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_reference_reassembles_native_framer_packets(ref):
    re, im = _spectrum(4)
    frame = native.spectrum_to_frame_bytes(re, im)
    asm = _ref_asm(ref)
    out = None
    for p in native.frame_to_packets(frame):
        out = asm.add(p, now_ms=0)
    assert out == frame
    assert np.array_equal(ref.decode_mag_16iq_le(frame), decode_frame(frame)[2])


def test_lossy_then_evicted_mixed_generation_parity(ref):
    """Sustained 1-packet loss: the reference completes a MIXED-generation
    frame (gen-A slots held 4 s past eviction still ride into the frame,
    because ``add`` checks completion BEFORE evicting,
    ``fft_analyzer_gui.py:320-352``). Our ``per_slot_eviction=True`` mode
    reproduces that byte-for-byte; the default whole-buffer policy drops the
    stale partial instead (documented divergence, PARITY.md quirks)."""
    fa = spectrum_to_frame_bytes(*_spectrum(5))
    fb = spectrum_to_frame_bytes(*_spectrum(6))
    pa, pb = frame_to_packets(fa), frame_to_packets(fb)
    lost = 7

    # reference: gen A minus slot 7 at t=0; gen B slot 7 at t=4000 ms
    asm_ref = _ref_asm(ref, evict_ms=3000)
    for k, p in enumerate(pa):
        if k != lost:
            assert asm_ref.add(p, now_ms=0) is None
    got_ref = asm_ref.add(pb[lost], now_ms=4000)
    assert got_ref is not None
    expected_mixed = b"".join(
        pb[k][1:] if k == lost else pa[k][1:] for k in range(PACKETS_PER_FRAME)
    )
    assert got_ref == expected_mixed  # mixed-generation frame

    # our reference-faithful mode: identical bytes under the same timeline
    t = [0.0]
    ours = MultiPacketAssembler(
        stale_after=3.0, clock=lambda: t[0], per_slot_eviction=True
    )
    for k, p in enumerate(pa):
        if k != lost:
            assert ours.add(p) is None
    t[0] = 4.0
    assert ours.add(pb[lost]) == got_ref

    # default policy: stale partial evicted, returns None (single-generation
    # guarantee)
    t2 = [0.0]
    strict = MultiPacketAssembler(stale_after=3.0, clock=lambda: t2[0])
    for k, p in enumerate(pa):
        if k != lost:
            assert strict.add(p) is None
    t2[0] = 4.0
    assert strict.add(pb[lost]) is None
    assert strict.packets_dropped == PACKETS_PER_FRAME - 1


def test_per_slot_eviction_drops_only_stale_slots(ref):
    """Slots age independently in per-slot mode (reference semantics): a
    fresh slot survives the eviction that removes older ones."""
    fa = spectrum_to_frame_bytes(*_spectrum(8))
    pa = frame_to_packets(fa)
    t = [0.0]
    ours = MultiPacketAssembler(
        stale_after=3.0, clock=lambda: t[0], per_slot_eviction=True
    )
    asm_ref = _ref_asm(ref, evict_ms=3000)
    ours.add(pa[0])
    asm_ref.add(pa[0], now_ms=0)
    t[0] = 2.0
    ours.add(pa[1])
    asm_ref.add(pa[1], now_ms=2000)
    t[0] = 4.0  # slot 0 stale (4 s), slot 1 fresh (2 s)
    ours.add(pa[2])
    asm_ref.add(pa[2], now_ms=4000)
    assert set(ours._slots) == {1, 2}
    assert [k for k, p in enumerate(asm_ref.packets) if p is not None] == [1, 2]
    assert ours.packets_dropped == 1


def test_invalid_count_byte_dropped_like_reference(ref):
    bad = bytes([200]) + bytes(1024)
    asm_ref = _ref_asm(ref)
    assert asm_ref.add(bad, now_ms=0) is None
    assert all(p is None for p in asm_ref.packets)
    ours = MultiPacketAssembler(per_slot_eviction=True)
    assert ours.add(bad) is None
    assert not ours._slots and ours.packets_dropped == 1


# ---------------------------------------------------------------------------
# Wire amplitudes: the xfft default-schedule level, via the reference decode
# ---------------------------------------------------------------------------


def test_full_scale_tone_wire_level_matches_schedule(ref):
    """A full-scale tone's wire int16, decoded by the REFERENCE's own math,
    sits at the level the xfft default scaling schedule (1/N, truncation)
    predicts: |X_wire[k]| = (1/N)*|FFT(x_int16)[k]| = A/2 for a raw tone."""
    from tpu_sdr.kernels import fft_q15 as fq

    n = 16384
    k0 = 300
    x = np.rint(32767 * np.cos(2 * np.pi * k0 * np.arange(n) / n)).astype(np.int16)
    re_q, im_q = fq.fft_q15_np(x)
    frame = frame_bytes_from_q15(re_q, im_q)
    mag = ref.decode_mag_16iq_le(frame)
    predicted = 32767 / 2  # A/2 at the tone bin, 1/N schedule
    assert abs(mag[k0] - predicted) <= 4.0, (mag[k0], predicted)
    assert abs(mag[n - k0] - predicted) <= 4.0
    # everything else is truncation noise, orders of magnitude down
    rest = np.delete(mag, [k0, n - k0])
    assert rest.max() < 64.0

    # and the float path with the derived XFFT_WIRE_SCALE lands within a few
    # wire LSBs of the integer model (the measured bound, tests/test_q15.py)
    spec = np.fft.fft(x.astype(np.float64) / 32768.0)
    frame_f = spectrum_to_frame_bytes(
        spec.real.astype(np.float32), spec.imag.astype(np.float32)
    )
    mag_f = ref.decode_mag_16iq_le(frame_f)
    assert abs(mag_f[k0] - mag[k0]) <= 4.0
    assert XFFT_WIRE_SCALE == 2.0


# ---------------------------------------------------------------------------
# Designer wire-bytes parity: our sos_to_wire_bytes vs the reference's
# executed design_iir_filter + quantize_coefficients + payload packing
# (fft_analyzer_gui.py:108-179,591-608) over a grid of designs.
# ---------------------------------------------------------------------------

_KIND_MAP = {  # our kind name -> the reference's
    "butterworth": "butter",
    "chebyshev1": "cheby1",
    "chebyshev2": "cheby2",
    "elliptic": "ellip",
    "bessel": "bessel",
}


def _ref_wire_bytes(ref, sos):
    """The reference's exact payload path: quantize, truncate/pad to 2
    sections (fft_analyzer_gui.py:1185-1192), pack via int(c) & 0xFF
    (:603, the UartReceiver._byte shorthand)."""
    coeffs = ref.quantize_coefficients(sos)
    if len(coeffs) > 2:
        coeffs = coeffs[:2]
    while len(coeffs) < 2:
        coeffs.append([64, 0, 0, 64, 0, 0])
    return bytes(int(c) & 0xFF for sec in coeffs for c in sec)


@pytest.mark.parametrize("kind", sorted(_KIND_MAP))
@pytest.mark.parametrize("btype", ["lowpass", "highpass", "bandpass", "bandstop"])
@pytest.mark.parametrize("order_cut", [(2, 10.0), (4, 10.0), (2, 20.0), (4, 3.0)])
def test_designer_wire_bytes_match_reference(ref, kind, btype, order_cut):
    """For every design the wire format can carry (<= 2 sections), our 12
    coefficient bytes are byte-identical to what the reference GUI would
    send to the FPGA for the same design request. Same units both sides
    (fs = 100.0, the reference's MHz default) so the Wn divisions — and
    therefore the SciPy SOS bits — are identical operations."""
    from tpu_sdr.control.designer import design_iir_filter, sos_to_wire_bytes

    order, cutoff = order_cut
    fs = 100.0
    kw = dict(kind=_KIND_MAP[kind], ripple=1.0, attenuation=40.0)
    if btype in ("bandpass", "bandstop"):
        ref_sos = ref.design_iir_filter(
            btype, order, cutoff, cutoff * 2, fs, **kw
        )
        ours = design_iir_filter(
            kind, btype, order, fs, (cutoff, cutoff * 2),
            ripple_db=1.0, attenuation_db=40.0,
        )
    else:
        ref_sos = ref.design_iir_filter(btype, order, cutoff, None, fs, **kw)
        ours = design_iir_filter(
            kind, btype, order, fs, cutoff, ripple_db=1.0, attenuation_db=40.0
        )
    np.testing.assert_array_equal(np.asarray(ref_sos), ours.sos)
    if ours.sos.shape[0] <= 2:
        assert ours.to_wire_bytes() == _ref_wire_bytes(ref, ref_sos)
    else:
        # DELIBERATE divergence: the GUI silently truncates >2-section
        # designs to 2 (fft_analyzer_gui.py:1185-1187), which silently
        # changes the realized response; we refuse and direct the user to
        # the array API instead. Assert both behaviors so the divergence
        # stays documented-and-tested, not accidental.
        with pytest.raises(ValueError, match="wire format carries 2"):
            sos_to_wire_bytes(ours.sos)
        truncated = _ref_wire_bytes(ref, ref_sos)
        assert truncated == _ref_wire_bytes(ref, np.asarray(ref_sos)[:2])


def test_designer_quantization_matches_reference_elementwise(ref):
    """quantize_coeff_x64 == the reference's quantize_coefficients on
    adversarial values: clip edges, +/-0.5 ties (np.round half-even), and
    coefficients beyond the int8 range."""
    from tpu_sdr.core.qformat import quantize_coeff_x64

    vals = np.array([
        [0.0078125, -0.0078125, 0.0234375, 1.0, -1.9921875, 0.9921875],
        [2.5, -2.5, 3.0, -3.0, 100.0, -100.0],  # saturation
        [0.0078124, 0.00390625, -0.00390625, 1.984375, -1.984375, 0.5],
    ])
    ours = quantize_coeff_x64(vals)
    theirs = np.array(ref.quantize_coefficients(vals), dtype=np.int8)
    np.testing.assert_array_equal(ours, theirs)
