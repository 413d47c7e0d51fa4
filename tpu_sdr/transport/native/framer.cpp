// Native host-edge hot path: spectrum quantize/interleave, packetize, CRC32.
//
// The reference performs these per-byte operations in hardware (the RMII
// serializer + CRC engine, imp/phy_rmii_if.vhd / imp/crc_generator.vhd);
// here they are the host-side cost of emitting the GUI wire format at
// multi-GSPS spectrum rates, so they get a C++ implementation (exposed via
// ctypes, with the NumPy versions in framing.py as oracle + fallback).
//
// Build: make -C tpu_sdr/transport/native

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// CRC-32 (IEEE 802.3, reflected), slicing-by-8
// ---------------------------------------------------------------------------

static uint32_t crc_tab[8][256];
static bool crc_init_done = false;

static void crc_init() {
    for (int i = 0; i < 256; ++i) {
        uint32_t c = (uint32_t)i;
        for (int k = 0; k < 8; ++k)
            c = (c & 1) ? (c >> 1) ^ 0xEDB88320u : (c >> 1);
        crc_tab[0][i] = c;
    }
    for (int i = 0; i < 256; ++i)
        for (int t = 1; t < 8; ++t)
            crc_tab[t][i] =
                (crc_tab[t - 1][i] >> 8) ^ crc_tab[0][crc_tab[t - 1][i] & 0xFF];
    crc_init_done = true;
}

// Raw (non-inverted) running CRC — the checker form (crc32_checker.vhd:27).
uint32_t crc32_raw(const uint8_t* data, uint64_t n, uint32_t crc) {
    if (!crc_init_done) crc_init();
    uint32_t c = crc;
    while (n >= 8) {
        uint32_t lo, hi;
        std::memcpy(&lo, data, 4);
        std::memcpy(&hi, data + 4, 4);
        lo ^= c;
        c = crc_tab[7][lo & 0xFF] ^ crc_tab[6][(lo >> 8) & 0xFF] ^
            crc_tab[5][(lo >> 16) & 0xFF] ^ crc_tab[4][lo >> 24] ^
            crc_tab[3][hi & 0xFF] ^ crc_tab[2][(hi >> 8) & 0xFF] ^
            crc_tab[1][(hi >> 16) & 0xFF] ^ crc_tab[0][hi >> 24];
        data += 8;
        n -= 8;
    }
    while (n--) c = crc_tab[0][(c ^ *data++) & 0xFF] ^ (c >> 8);
    return c;
}

// Final (inverted) Ethernet CRC — the generator form (crc_generator.vhd:84-86).
uint32_t crc32_eth(const uint8_t* data, uint64_t n, uint32_t crc) {
    return crc32_raw(data, n, crc) ^ 0xFFFFFFFFu;
}

// ---------------------------------------------------------------------------
// Spectrum -> wire frame: scale, round, saturate, interleave {re, im} LE int16
// ---------------------------------------------------------------------------

void quantize_interleave(const float* re, const float* im, int16_t* out,
                         uint64_t n_bins, float scale) {
    for (uint64_t i = 0; i < n_bins; ++i) {
        float r = std::nearbyint(re[i] * scale);
        float m = std::nearbyint(im[i] * scale);
        r = std::min(32767.0f, std::max(-32768.0f, r));
        m = std::min(32767.0f, std::max(-32768.0f, m));
        out[2 * i] = (int16_t)r;
        out[2 * i + 1] = (int16_t)m;
    }
}

// ---------------------------------------------------------------------------
// Frame -> 64 x (1 + 1024) payloads, count byte = packet index mod 64
// (imp/phy_rmii_if.vhd:322)
// ---------------------------------------------------------------------------

void packetize(const uint8_t* frame, uint8_t* out, uint32_t packets,
               uint32_t data_size) {
    for (uint32_t k = 0; k < packets; ++k) {
        uint8_t* p = out + (uint64_t)k * (data_size + 1);
        p[0] = (uint8_t)(k % 64);
        std::memcpy(p + 1, frame + (uint64_t)k * data_size, data_size);
    }
}

// Reassemble payloads (any order). Returns number of distinct slots filled.
uint32_t assemble(const uint8_t* payloads, uint32_t count, uint32_t data_size,
                  uint8_t* frame_out) {
    uint64_t seen = 0;
    uint32_t filled = 0;
    for (uint32_t i = 0; i < count; ++i) {
        const uint8_t* p = payloads + (uint64_t)i * (data_size + 1);
        uint32_t slot = p[0] % 64;
        if (!(seen >> slot & 1)) {
            seen |= 1ull << slot;
            ++filled;
        }
        std::memcpy(frame_out + (uint64_t)slot * data_size, p + 1, data_size);
    }
    return filled;
}

}  // extern "C"
