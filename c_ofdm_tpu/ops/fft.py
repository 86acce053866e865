"""Batched FFT primitives for the OFDM chain.

Two interchangeable backends:

* ``xla`` — ``jnp.fft.fft/ifft`` (XLA's native TPU FFT).
* ``matmul`` — explicit DFT-matrix contraction.  For the small transform sizes
  used here (256-4096) with large symbol batches, the MXU's matmul throughput
  can beat the native FFT; it also enables *partial* DFTs (only the bins we
  need — see ``dft_rows``), which the sync detector exploits.

Conventions match FFTW (reference `OFDM/Frame.cpp:16-24`): ``fft_fwd`` is the
unnormalized forward transform (== jnp.fft.fft); ``ifft_unnorm`` is the
unnormalized backward transform (== N * jnp.fft.ifft).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def _dft_matrix_np(n: int, sign: int) -> np.ndarray:
    k = np.arange(n)
    return np.exp(sign * 2j * np.pi * np.outer(k, k) / n)


def dft_rows(n: int, rows: np.ndarray, sign: int = -1) -> np.ndarray:
    """Selected rows of the (unnormalized) DFT matrix: [len(rows), n]."""
    k = np.arange(n)
    return np.exp(sign * 2j * np.pi * np.outer(np.asarray(rows), k) / n)


def fft_fwd(x: jnp.ndarray, backend: str = "xla") -> jnp.ndarray:
    """Unnormalized forward FFT along the last axis."""
    if backend in ("matmul", "matmul_bf16"):
        return _matmul_dft(x, sign=-1, bf16=backend.endswith("bf16"))
    if backend == "pallas" and x.dtype == jnp.complex64:
        from . import pallas_fft
        return pallas_fft.dft_pallas(x, sign=-1)
    return jnp.fft.fft(x)


def ifft_unnorm(x: jnp.ndarray, backend: str = "xla") -> jnp.ndarray:
    """Unnormalized backward FFT (FFTW convention) along the last axis."""
    if backend in ("matmul", "matmul_bf16"):
        return _matmul_dft(x, sign=+1, bf16=backend.endswith("bf16"))
    if backend == "pallas" and x.dtype == jnp.complex64:
        from . import pallas_fft
        return pallas_fft.dft_pallas(x, sign=+1)
    return jnp.fft.ifft(x) * x.shape[-1]


def complex_matmul(x: jnp.ndarray, w: np.ndarray, bf16: bool = False) -> jnp.ndarray:
    """x [..., k] @ w [k, m] for complex operands as 4 real MXU matmuls.

    ``w`` is a host constant (DFT basis); ``bf16`` casts operands to bfloat16
    with float32 accumulation (double MXU rate, ~1e-3 relative error)."""
    rdt = jnp.finfo(x.real.dtype).dtype
    mdt = jnp.bfloat16 if bf16 else rdt
    wr = jnp.asarray(w.real, dtype=mdt)
    wi = jnp.asarray(w.imag, dtype=mdt)
    xr = x.real.astype(mdt)
    xi = x.imag.astype(mdt)
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=rdt)  # noqa: E731
    yr = dot(xr, wr) - dot(xi, wi)
    yi = dot(xr, wi) + dot(xi, wr)
    return jax_lax_complex(yr.astype(rdt), yi.astype(rdt))


def _matmul_dft(x: jnp.ndarray, sign: int, bf16: bool = False) -> jnp.ndarray:
    """Complex DFT as 4 real matmuls (MXU path); preserves complex dtype.

    ``bf16``: operands in bfloat16 with float32 accumulation — double MXU
    rate; per-bin relative error ~1e-3 after the N-term sum, comfortably
    inside the link's EVM budget for QAM16/64 (validated in tests).
    """
    return complex_matmul(x, _dft_matrix_np(x.shape[-1], sign), bf16)


def jax_lax_complex(re: jnp.ndarray, im: jnp.ndarray) -> jnp.ndarray:
    return re + 1j * im


def partial_dft(x: jnp.ndarray, rows: np.ndarray, sign: int = -1) -> jnp.ndarray:
    """Project x[..., n] onto selected DFT bins: returns [..., len(rows)].

    Cost is O(n * len(rows)) on the MXU instead of O(n log n) on the VPU — a
    large win when only a handful of bins matter (two-tone detection).
    """
    n = x.shape[-1]
    w = dft_rows(n, rows, sign).T  # [n, n_rows]
    rdt = jnp.finfo(x.real.dtype).dtype
    wr = jnp.asarray(w.real, dtype=rdt)
    wi = jnp.asarray(w.imag, dtype=rdt)
    xr, xi = x.real, x.imag
    yr = xr @ wr - xi @ wi
    yi = xr @ wi + xi @ wr
    return jax_lax_complex(yr, yi)
