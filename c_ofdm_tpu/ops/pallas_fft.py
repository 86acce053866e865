"""Pallas TPU kernel: batched small-N DFT as MXU matmuls.

For the transform sizes an OFDM symbol uses (256-8192) with large symbol
batches, the DFT-as-matmul formulation maps directly onto the MXU systolic
array: a complex DFT is 4 real [B,N]x[N,N] matmuls.  The kernel tiles the
batch dimension, keeps the twiddle matrices resident in VMEM across grid
steps, and fuses the FFTW-style normalization — avoiding the VPU-bound
native FFT path and the extra HBM round-trips between FFT and scaling.

Complex data is carried as separate real/imag float32 planes (Pallas TPU has
no native complex dtype).

STATUS: retired from the production path (kept opt-in via ops.fft
backend="pallas" and covered by tests/test_pallas_fft.py).  The XLA
matmul-DFT backend (`fft_backend="matmul"`, the production default in
bench/apps) already reaches the MXU for the same formulation, and this
kernel's compile under vmap exceeded the relayed TPU's compile budget
(PERF.md).  The Pallas kernel that IS in production is the frame-window
extractor (`ops/pallas_extract.py`, 5.9x over the XLA gather).  Falls back
to interpret mode off-TPU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dft_planes(n: int, sign: int, scale: float):
    k = np.arange(n)
    w = np.exp(sign * 2j * np.pi * np.outer(k, k) / n) * scale
    return (np.ascontiguousarray(w.real.astype(np.float32)),
            np.ascontiguousarray(w.imag.astype(np.float32)))


def _dft_kernel(xr_ref, xi_ref, wr_ref, wi_ref, yr_ref, yi_ref):
    xr = xr_ref[:]
    xi = xi_ref[:]
    wr = wr_ref[:]
    wi = wi_ref[:]
    yr_ref[:] = (jnp.dot(xr, wr, preferred_element_type=jnp.float32)
                 - jnp.dot(xi, wi, preferred_element_type=jnp.float32))
    yi_ref[:] = (jnp.dot(xr, wi, preferred_element_type=jnp.float32)
                 + jnp.dot(xi, wr, preferred_element_type=jnp.float32))


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _dft_planes_call(x2, n: int, sign: int, scale: float, interpret: bool):
    """x2: [2, B, n] float32 (real/imag planes) -> [2, B, n]."""
    B = x2.shape[1]
    tile_b = min(256, B) if B % min(256, B) == 0 else B
    wr, wi = _dft_planes(n, sign, scale)
    grid = (B // tile_b,)
    out = pl.pallas_call(
        _dft_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, n), jnp.float32),
                   jax.ShapeDtypeStruct((B, n), jnp.float32)],
        interpret=interpret,
    )(x2[0], x2[1], jnp.asarray(wr), jnp.asarray(wi))
    return jnp.stack(out)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def dft_pallas(x: jnp.ndarray, sign: int = -1, scale: float = 1.0) -> jnp.ndarray:
    """Unnormalized (scaled) DFT along the last axis of complex x [..., n].

    sign=-1: forward (FFTW FORWARD); sign=+1: backward (FFTW BACKWARD).
    ``scale`` is fused into the twiddle matrix (e.g. 1/sqrt(n) TX norm).
    """
    n = x.shape[-1]
    lead = x.shape[:-1]
    b = int(np.prod(lead)) if lead else 1
    xr = x.real.astype(jnp.float32).reshape(b, n)
    xi = x.imag.astype(jnp.float32).reshape(b, n)
    y = _dft_planes_call(jnp.stack([xr, xi]), n, sign, float(scale),
                         not _on_tpu())
    out = (y[0] + 1j * y[1]).astype(jnp.complex64)
    return out.reshape(*lead, n)
