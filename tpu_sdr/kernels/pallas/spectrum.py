"""Pallas TPU kernel: fused window + four-step FFT + magnitude per frame.

The XLA path materializes the windowed frame, both DFT passes and the
twiddled intermediate in HBM when fusion heuristics split the graph. This
kernel keeps one whole 16K frame resident in VMEM across all steps — HBM
traffic per frame drops to one 64 KB read + one 64 KB write, far below the
roofline knee, leaving the MXU matmuls as the only cost.

Layout per frame (n1 = n2 = 128):

  x (n2, n1) --*win--> X --W2@--> Y --*tw--> T --@W1^T--> Z --|.|--> mag

All operands (frame, window, W2 re/im, twiddle re/im, W1 re/im) fit in
VMEM: 9 x 64 KB + scratch. Grid = number of frames; Mosaic double-buffers
the frame loads across grid steps automatically.

Replaces the Xilinx xfft IP + host magnitude decode
(``ip/xfft_0/xfft_0.xci``, ``scripts/fft_analyzer_gui.py:256-260``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dotT(a, b, precision):
    """a (m, k) contracted with b (n, k) over k -> (m, n), f32 accumulate."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )


def _spectrum_kernel(
    x_ref, win_ref, w2r_ref, w2i_ref, twr_ref, twi_ref, w1r_ref, w1i_ref,
    out_ref, *, precision,
):
    # 1. window (elementwise, VPU); block shapes are (1, n2, n1)
    xw = x_ref[0] * win_ref[:]
    # 2. column DFTs: Y[k2, n1] = sum_n2 W2[k2, n2] * xw[n2, n1]   (MXU)
    yr = jnp.dot(w2r_ref[:], xw, preferred_element_type=jnp.float32,
                 precision=precision)
    yi = jnp.dot(w2i_ref[:], xw, preferred_element_type=jnp.float32,
                 precision=precision)
    # 3. twiddle (elementwise, VPU)
    tr = yr * twr_ref[:] - yi * twi_ref[:]
    ti = yr * twi_ref[:] + yi * twr_ref[:]
    # 4. row DFTs: Z[k2, k1] = sum_n1 (tr + i*ti)[k2, n1] * W1[k1, n1] (MXU)
    zr = _dotT(tr, w1r_ref[:], precision) - _dotT(ti, w1i_ref[:], precision)
    zi = _dotT(tr, w1i_ref[:], precision) + _dotT(ti, w1r_ref[:], precision)
    # 5. magnitude, transposed to natural output order: out[k1, k2] = |Z[k2, k1]|
    out_ref[0] = jnp.sqrt(zr * zr + zi * zi).T


@functools.partial(
    jax.jit, static_argnames=("n1", "n2", "interpret", "precision")
)
def fft_mag_fused(
    frames: jnp.ndarray,
    win: jnp.ndarray,
    plan: dict,
    n1: int = 128,
    n2: int = 128,
    interpret: bool = False,
    precision: str = "highest",
):
    """frames (F, N) float32, win (N,) -> magnitude (F, N).

    Output index k = n2*k1 + k2 (natural order), identical to
    ``tpu_sdr.kernels.fft.fft_4step`` + ``magnitude``.
    """
    f = frames.shape[0]
    n = n1 * n2
    x = frames.reshape(f, n2, n1)
    win2d = win.reshape(n2, n1)

    frame_spec = pl.BlockSpec(
        (1, n2, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    const_spec = pl.BlockSpec(
        (n2, n1), lambda i: (0, 0), memory_space=pltpu.VMEM
    )

    out = pl.pallas_call(
        functools.partial(_spectrum_kernel, precision=precision),
        out_shape=jax.ShapeDtypeStruct((f, n1, n2), jnp.float32),
        grid=(f,),
        in_specs=[frame_spec] + [const_spec] * 7,
        out_specs=pl.BlockSpec(
            (1, n1, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        x, win2d,
        plan["w2r"], plan["w2i"],
        plan["twr"], plan["twi"],
        plan["w1r"], plan["w1i"],
    )
    return out.reshape(f, n)
