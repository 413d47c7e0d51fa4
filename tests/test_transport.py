"""Wire format, packetization, CRC/IP parity, native layer, UDP loopback."""

import numpy as np
import pytest
import zlib

from tpu_sdr.transport import (
    FRAME_SIZE_BYTES,
    MultiPacketAssembler,
    crc32_ethernet,
    decode_frame,
    frame_to_packets,
    packets_to_frame,
    spectrum_to_frame_bytes,
)
from tpu_sdr.transport import crc32 as crc32_mod
from tpu_sdr.transport import ipstack, native


def _spectrum(seed=0):
    rng = np.random.default_rng(seed)
    re = (rng.standard_normal(16384) * 1000).astype(np.float32)
    im = (rng.standard_normal(16384) * 1000).astype(np.float32)
    return re, im


def test_frame_roundtrip():
    re, im = _spectrum()
    frame = spectrum_to_frame_bytes(re, im, scale=1.0)
    assert len(frame) == FRAME_SIZE_BYTES
    re2, im2, mag = decode_frame(frame)
    assert np.max(np.abs(re2 - np.rint(re))) <= 0
    assert np.allclose(mag, np.sqrt(re2**2 + im2**2))


def test_default_scale_is_hardware_faithful():
    """Default quantization models the xfft 1/N schedule: wire LSBs are
    2^15/N per unit float amplitude (framing.XFFT_WIRE_SCALE)."""
    from tpu_sdr.transport.framing import XFFT_WIRE_SCALE, N_BINS

    assert XFFT_WIRE_SCALE == 32768.0 / N_BINS == 2.0
    re, im = _spectrum()
    r_def, _, _ = decode_frame(spectrum_to_frame_bytes(re, im))
    r_exp, _, _ = decode_frame(spectrum_to_frame_bytes(re, im, XFFT_WIRE_SCALE))
    assert np.array_equal(r_def, r_exp)


def test_frame_saturation():
    re = np.array([1e9, -1e9] + [0.0] * 16382, dtype=np.float32)
    im = np.zeros(16384, dtype=np.float32)
    r2, _, _ = decode_frame(spectrum_to_frame_bytes(re, im))
    assert r2[0] == 32767 and r2[1] == -32768


def test_packetize_roundtrip_out_of_order():
    re, im = _spectrum(1)
    frame = spectrum_to_frame_bytes(re, im)
    pkts = frame_to_packets(frame)
    assert len(pkts) == 64 and all(len(p) == 1025 for p in pkts)
    assert [p[0] for p in pkts] == list(range(64))
    rng = np.random.default_rng(0)
    shuffled = [pkts[i] for i in rng.permutation(64)]
    assert packets_to_frame(shuffled) == frame


def test_assembler_eviction():
    t = [0.0]
    asm = MultiPacketAssembler(stale_after=3.5, clock=lambda: t[0])
    re, im = _spectrum(2)
    pkts = frame_to_packets(spectrum_to_frame_bytes(re, im))
    for p in pkts[:10]:
        assert asm.add(p) is None
    t[0] = 10.0  # stale: partial frame evicted
    for p in pkts[:-1]:
        assert asm.add(p) is None
    out = asm.add(pkts[-1])
    assert out is not None
    assert asm.packets_dropped == 10
    assert asm.frames_assembled == 1


def test_crc32_matches_zlib_and_residue():
    data = b"The quick brown fox jumps over the lazy dog" * 7
    assert crc32_ethernet(data) == zlib.crc32(data)
    frame = data + crc32_mod.fcs_bytes(data)
    assert crc32_mod.check_frame(frame)
    corrupted = bytearray(frame)
    corrupted[3] ^= 0x40
    assert not crc32_mod.check_frame(bytes(corrupted))


def test_ip_header_matches_reference_rom():
    """Static fields must equal head_data.mif; dynamic fields per RTL rules."""
    payload_len = 1025
    hdr = ipstack.build_header(payload_len, frame_id=7)
    assert len(hdr) == 42
    assert hdr[0:6] == bytes.fromhex("FFFFFFFFFFFF")  # dst MAC
    assert hdr[6:12] == bytes.fromhex("001122334455")  # src MAC
    assert hdr[12:14] == b"\x08\x00"  # IPv4
    assert hdr[14] == 0x45
    assert hdr[22] == 64  # TTL
    assert hdr[23] == 0x11  # UDP
    assert hdr[26:30] == bytes([169, 254, 252, 255])  # src IP
    assert hdr[30:34] == bytes([255, 255, 255, 255])  # dst IP
    parsed = ipstack.parse_header(hdr + b"\x00" * payload_len)
    assert parsed["checksum_ok"]
    assert parsed["ip_id"] == 7
    assert parsed["src_port"] == 5005 and parsed["dst_port"] == 6006
    assert parsed["udp_len"] == 8 + payload_len
    assert parsed["ip_len"] == 28 + payload_len
    assert parsed["udp_checksum"] == 0  # hardware sends 0


def test_full_ethernet_frame_fcs():
    re, im = _spectrum(3)
    pkt = frame_to_packets(spectrum_to_frame_bytes(re, im))[0]
    wire = ipstack.build_ethernet_frame(pkt, frame_id=0)
    assert crc32_mod.check_frame(wire)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
class TestNativeParity:
    def test_crc_parity(self):
        data = bytes(np.random.default_rng(0).integers(0, 256, 100_000, dtype=np.uint8))
        assert native.crc32_ethernet(data) == crc32_ethernet(data)
        assert native.crc32_raw(data) == crc32_mod.crc32_update_raw(data)

    def test_frame_parity(self):
        re, im = _spectrum(4)
        assert native.spectrum_to_frame_bytes(re, im) == spectrum_to_frame_bytes(re, im)

    def test_packetize_parity(self):
        re, im = _spectrum(5)
        frame = spectrum_to_frame_bytes(re, im)
        assert native.frame_to_packets(frame) == frame_to_packets(frame)

    def test_assemble_parity_drops_invalid_count_bytes(self):
        """C++ assemble == MultiPacketAssembler drop semantics: a corrupt
        count byte (>= 64) is DROPPED, never aliased into slot c%64 where
        it would overwrite a genuine packet (review finding)."""
        re, im = _spectrum(6)
        frame = spectrum_to_frame_bytes(re, im)
        pkts = frame_to_packets(frame)
        # shuffled + a corrupt duplicate of slot 7's data with count 64+7:
        # aliasing would overwrite slot 7 with the corrupt payload
        rng = np.random.default_rng(6)
        bad = bytes([64 + 7]) + bytes(1024)
        shuffled = [pkts[i] for i in rng.permutation(64)]
        out, filled = native.assemble_payloads(shuffled + [bad])
        assert filled == 64
        assert out == frame  # bad packet left no trace
        # NumPy fallback path agrees bit-for-bit (temporarily hide the lib)
        import tpu_sdr.transport.native as nat

        saved = nat._lib, nat._tried
        try:
            nat._lib, nat._tried = None, True
            out_py, filled_py = nat.assemble_payloads(shuffled + [bad])
        finally:
            nat._lib, nat._tried = saved
        assert (out_py, filled_py) == (out, filled)
        # missing slots: filled < 64 and the hole reads as zeros
        out2, filled2 = native.assemble_payloads(shuffled[:-1])
        assert filled2 == 63


def test_udp_loopback_end_to_end():
    """Sender -> OS loopback -> receiver -> decoded spectra."""
    from tpu_sdr.transport.udp_stream import UdpSpectrumReceiver, UdpSpectrumSender
    import time

    got = []
    rx = UdpSpectrumReceiver(
        port=0, bind_ip="127.0.0.1", fps_cap=0.0,
        on_frame=lambda re, im, mag: got.append(mag.copy()),
    )
    rx.fps_cap = 1e9  # no rate limit for the test
    rx.start()
    tx = UdpSpectrumSender("127.0.0.1", rx.port)
    re, im = _spectrum(6)
    for _ in range(3):
        tx.send_spectrum(re, im, scale=1.0)
    deadline = time.time() + 5.0
    while len(got) < 3 and time.time() < deadline:
        time.sleep(0.02)
    rx.stop(); tx.close()
    assert len(got) == 3
    expected = np.sqrt(np.rint(re) ** 2 + np.rint(im) ** 2)
    assert np.allclose(got[0], expected)
    assert rx.frames_received == 3


def test_udp_checksum_parity():
    """Pseudo-header UDP checksum (the reference's unused udp_utils engine)."""
    import struct

    payload = b"\x07" + bytes(range(250))
    c = ipstack.udp_checksum(payload)
    # verify: checksum over the same data incl. the checksum field == 0
    udp_len = 8 + len(payload)
    pseudo = (
        bytes([169, 254, 252, 255, 255, 255, 255, 255])
        + struct.pack(">BBH", 0, 0x11, udp_len)
    )
    hdr = struct.pack(">HHHH", 5005, 6006, udp_len, c)
    data = pseudo + hdr + payload
    if len(data) % 2:
        data += b"\x00"
    s = 0
    for i in range(0, len(data), 2):
        s += (data[i] << 8) | data[i + 1]
    while s >> 16:
        s = (s & 0xFFFF) + (s >> 16)
    assert s == 0xFFFF


def test_native_rejects_bad_lengths():
    """The C++ wrappers enforce the same validation as the NumPy fallback."""
    if not native.available():
        pytest.skip("no C++ toolchain")
    with pytest.raises(ValueError, match="frame must be"):
        native.frame_to_packets(b"\x00" * 1024)
    with pytest.raises(ValueError, match="equal-length"):
        native.spectrum_to_frame_bytes(
            np.zeros(16384, np.float32), np.zeros(100, np.float32)
        )


@pytest.mark.skipif(not native.udp_available(), reason="native UDP not built")
class TestNativeUdp:
    """Batch (sendmmsg/recvmmsg) transport: wire parity + cross-path loopback."""

    def _capture_packets(self, use_native_tx: bool, n: int = 64):
        """Send one frame, capture its datagrams with a plain socket."""
        import socket as s
        from tpu_sdr.transport.udp_stream import UdpSpectrumSender

        sock = s.socket(s.AF_INET, s.SOCK_DGRAM)
        sock.bind(("127.0.0.1", 0))
        sock.settimeout(2.0)
        tx = UdpSpectrumSender(
            "127.0.0.1", sock.getsockname()[1], use_native=use_native_tx
        )
        re, im = _spectrum(7)
        tx.send_spectrum(re, im)
        pkts = []
        try:
            for _ in range(n):
                pkts.append(sock.recvfrom(2048)[0])
        finally:
            tx.close()
            sock.close()
        return pkts

    def test_native_sender_wire_identical_to_python(self):
        a = self._capture_packets(use_native_tx=True)
        b = self._capture_packets(use_native_tx=False)
        # key by count byte: arrival order is not part of the contract
        assert sorted(a) == sorted(b)
        assert {p[0] for p in a} == set(range(64))
        assert all(len(p) == 1025 for p in a)

    @pytest.mark.parametrize("ntx,nrx", [(True, False), (False, True), (True, True)])
    def test_cross_path_loopback(self, ntx, nrx):
        import time
        from tpu_sdr.transport.udp_stream import (
            UdpSpectrumReceiver,
            UdpSpectrumSender,
        )

        got = []
        rx = UdpSpectrumReceiver(
            port=0, bind_ip="127.0.0.1", fps_cap=1e9, use_native=nrx,
            on_frame=lambda re, im, mag: got.append((re.copy(), im.copy())),
        )
        assert (rx._nsock is not None) == nrx
        rx.start()
        tx = UdpSpectrumSender("127.0.0.1", rx.port, use_native=ntx)
        assert (tx._native is not None) == ntx
        re, im = _spectrum(8)
        for _ in range(3):
            tx.send_spectrum(re, im, scale=1.0)
        deadline = time.time() + 5.0
        while len(got) < 3 and time.time() < deadline:
            time.sleep(0.02)
        rx.stop()
        tx.close()
        assert len(got) == 3
        assert np.array_equal(got[0][0], np.rint(re))
        assert np.array_equal(got[0][1], np.rint(im))

    def test_native_receiver_src_filtering(self):
        import time
        from tpu_sdr.transport.udp_stream import (
            UdpSpectrumReceiver,
            UdpSpectrumSender,
        )

        rx = UdpSpectrumReceiver(
            port=0, bind_ip="127.0.0.1", fps_cap=1e9,
            expected_src=("10.9.9.9", 1),  # nothing matches
        )
        assert rx._nsock is not None
        rx.start()
        tx = UdpSpectrumSender("127.0.0.1", rx.port)
        re, im = _spectrum(9)
        tx.send_spectrum(re, im)
        deadline = time.time() + 2.0
        while rx.packets_filtered < 64 and time.time() < deadline:
            time.sleep(0.02)
        rx.stop()
        tx.close()
        assert rx.packets_filtered == 64
        assert rx.frames_received == 0


def test_invalid_count_byte_dropped_default_policy():
    """The wire's UDP checksum is 0 (PARITY quirk 7), so a corrupted count
    byte arrives undetected: the default assembler must DROP it like the
    reference, never alias it into slot (idx % 64) over a genuine packet."""
    asm = MultiPacketAssembler()
    re, im = _spectrum(7)
    pkts = frame_to_packets(spectrum_to_frame_bytes(re, im))
    for p in pkts[:-1]:
        assert asm.add(p) is None
    bad = bytes([64]) + bytes(1024)  # bit-flip of count byte 0
    assert asm.add(bad) is None
    assert asm.packets_dropped == 1
    frame = asm.add(pkts[-1])
    assert frame == spectrum_to_frame_bytes(re, im)  # slot 0 uncorrupted


def test_packets_to_frame_rejects_invalid_count_byte():
    re, im = _spectrum(8)
    pkts = frame_to_packets(spectrum_to_frame_bytes(re, im))
    pkts[3] = bytes([200]) + pkts[3][1:]
    with pytest.raises(ValueError, match="invalid count byte"):
        packets_to_frame(pkts)


def test_native_f64_quantization_matches_fallback_oracle():
    """Review finding: the native path coerced float64 spectra to f32
    before quantizing while the NumPy fallback rounds in f64 — a 1-LSB
    wire difference between hosts with and without a C++ toolchain. Now
    non-f32 input routes through the f64 oracle on both."""
    from tpu_sdr.transport import framing

    rng = np.random.default_rng(7)
    re = rng.standard_normal(framing.N_BINS) * 3000.0  # float64
    im = rng.standard_normal(framing.N_BINS) * 3000.0
    assert native.spectrum_to_frame_bytes(re, im, 1.0) == \
        framing.spectrum_to_frame_bytes(re, im, 1.0)
    # f32 input keeps native/fallback parity too
    re32, im32 = re.astype(np.float32), im.astype(np.float32)
    assert native.spectrum_to_frame_bytes(re32, im32, 1.0) == \
        framing.spectrum_to_frame_bytes(re32, im32, 1.0)


def test_native_assemble_rejects_mixed_length_payloads():
    """Review finding: a 1024+1026-byte pair sums to 2*1025 and passed the
    native path's total-length check, then was misparsed at fixed strides.
    Both paths now validate per-payload."""
    good = bytes([0]) + bytes(1024)
    with pytest.raises(ValueError, match="1025"):
        native.assemble_payloads([good[:1024], good + b"\x00"])


def test_wrong_size_datagram_counts_in_stats():
    """Review finding: the receiver's early size pre-check bypassed the
    assembler's packets_dropped accounting, freezing every stat at zero
    for a mis-sized sender."""
    from tpu_sdr.transport.udp_stream import UdpSpectrumReceiver

    rx = UdpSpectrumReceiver(port=0, expected_src=None, on_frame=lambda *a: None)
    try:
        before = rx.assembler.packets_dropped
        rx._handle_packet(b"\x00" * 1024, ("127.0.0.1", 5005))  # short
        assert rx.assembler.packets_dropped == before + 1
    finally:
        rx.stop()


def test_native_sender_survives_port_unreachable():
    """Review finding: the connected native UDP socket surfaced the
    receiver's ICMP port-unreachable as ECONNREFUSED on the next send,
    crashing the fire-and-forget streaming loop the moment the GUI
    detached; the sendto fallback never sees this. Both paths must keep
    streaming with nobody listening."""
    import time as _time

    if not native.udp_available():
        pytest.skip("native UDP not built")
    from tpu_sdr.transport.udp_stream import UdpSpectrumSender

    # a localhost port with no receiver bound
    tx = UdpSpectrumSender("127.0.0.1", 49999, use_native=True)
    try:
        assert tx._native is not None
        frame = bytes(64 * 1024)
        for _ in range(4):  # ICMP error lands after the first send
            tx.send_frame_bytes(frame)
            _time.sleep(0.05)
        assert tx.frames_sent == 4
    finally:
        tx.close()
