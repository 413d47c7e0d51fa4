// Native Q15 integer SOS filter — the host-side hot loop of the
// hardware-faithful split pipeline (runtime/q15.py, device_fft=True).
//
// Bit-exact implementation of the 'intended' fixed-point semantics the
// NumPy oracle defines (control/golden.sosfilt_q15_intended, mirroring
// the reference RTL's custom-coefficient cascade src/filter_iir12_cust.vhd
// with the intended /64 scale): int8 x64 coefficients as int64, products
// accumulated in int64, each section output scaled by >>6 with
// round-half-away-from-zero, saturated to int16. The per-sample, per-
// section recurrence is inherently sequential (saturation is nonlinear),
// which is why it lives in C++ rather than a JAX op: the Python oracle
// runs ~0.2 MSPS, this loop runs ~50+ MSPS, so the faithful FILTERED live
// mode keeps up with the reference's 1 MSPS with two orders of margin.
//
// Contract notes:
//  - sos rows are [b0, b1, b2, a0, a1, a2] with a0 == 64 (validated by the
//    caller; enforced here too — returns -1 so a bad call cannot silently
//    produce non-faithful bits);
//  - z is the (n_sections, 2) int64 pre-shift accumulator state, updated
//    in place (same layout as the oracle's zf);
//  - batch variant filters R independent rows with per-row state.

#include <cstdint>

namespace {

inline int64_t rshift_half_away6(int64_t v) {
    // arithmetic >>6 with round-half-away-from-zero (qformat.rshift_round_half_away)
    return v >= 0 ? (v + 32) >> 6 : -(((-v) + 32) >> 6);
}

inline int64_t sat16(int64_t v) {
    if (v > 32767) return 32767;
    if (v < -32768) return -32768;
    return v;
}

}  // namespace

extern "C" {

// One row: x (n) int16 -> y (n) int16; z (n_sections*2) int64 in/out.
// Returns 0, or -1 when any a0 != 64.
int sosfilt_q15(const int64_t* sos, int n_sections, const int16_t* x,
                int64_t n, int64_t* z, int16_t* y) {
    for (int s = 0; s < n_sections; ++s) {
        if (sos[s * 6 + 3] != 64) return -1;
    }
    for (int64_t i = 0; i < n; ++i) {
        int64_t v = x[i];
        for (int s = 0; s < n_sections; ++s) {
            const int64_t* c = sos + s * 6;
            int64_t* zs = z + s * 2;
            int64_t out = sat16(rshift_half_away6(c[0] * v + zs[0]));
            zs[0] = c[1] * v - c[4] * out + zs[1];
            zs[1] = c[2] * v - c[5] * out;
            v = out;
        }
        y[i] = static_cast<int16_t>(v);
    }
    return 0;
}

// R independent rows (channels), contiguous x/y (R, n) and z (R, S, 2).
int sosfilt_q15_batch(const int64_t* sos, int n_sections, const int16_t* x,
                      int64_t rows, int64_t n, int64_t* z, int16_t* y) {
    for (int64_t r = 0; r < rows; ++r) {
        int rc = sosfilt_q15(sos, n_sections, x + r * n, n,
                             z + r * n_sections * 2, y + r * n);
        if (rc != 0) return rc;
    }
    return 0;
}

}  // extern "C"
