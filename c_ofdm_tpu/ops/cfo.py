"""Carrier-frequency-offset and phase recovery, batch-vectorized.

Four estimators applied in the reference RX order (`main.cpp:60-63`):
coarse pilot CFO -> derotation -> per-symbol CP fine CFO -> common phase.

Shapes: ``sig`` is [..., n] with leading batch dims; all returns broadcast.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import fft as fftops


def pilot_freq_shift(spec, preamble_sig: jnp.ndarray) -> jnp.ndarray:
    """Coarse CFO from pilot peaks of the fftshifted preamble spectrum
    (`OFDM/Frame.hpp:285-337`).  preamble_sig [..., preamble_len] -> [...]."""
    size = spec.cfg.preamble_len
    # measured on-TPU (B=256): this lone 640-pt FFT is faster via XLA than
    # matmul-DFT (demod step 0.179 vs 0.223 ms) — too skinny for the MXU
    amp = jnp.abs(jnp.fft.fftshift(
        fftops.fft_fwd(preamble_sig[..., :size]), axes=-1))
    borders = spec.cfo_borders
    total = None
    used = 0
    for i in range(spec.cfg.num_pilot_subc + 1):
        if not spec.cfo_window_mask[i]:
            continue
        lo, hi = int(borders[i]), int(borders[i + 1])
        peak = lo + jnp.argmax(amp[..., lo:hi], axis=-1)
        total = peak if total is None else total + peak
        used += 1
    # reference divides by num_pilot_subc (== number of used windows)
    shift = total.astype(amp.dtype) / spec.cfg.num_pilot_subc
    return (shift - size / 2) / size


def apply_freq_shift(sig: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """Derotate by e^{-2πi·shift·n} (`OFDM/Frame.hpp:340-348`).
    shift broadcasts over leading dims of sig [..., n]."""
    n = np.arange(sig.shape[-1])
    ang = -2 * np.pi * shift[..., None] * jnp.asarray(n, dtype=sig.real.dtype)
    return sig * jnp.exp(1j * ang.astype(sig.real.dtype)).astype(sig.dtype)


def cp_freq_correct(spec, sig: jnp.ndarray) -> jnp.ndarray:
    """Per-symbol fine CFO from CP<->tail correlation with cross-symbol phase
    accumulation (`OFDM/Frame.hpp:238-263`).

    The reference's serial loop is algebraically parallel: the accumulated
    scalar shift cancels inside each symbol's conj product, so all symbol
    phases are estimated independently and the applied ramp is a cumsum.
    sig [..., nsym*ofdm_len].
    """
    ol, fft, cp = spec.cfg.ofdm_len, spec.cfg.fft_size, spec.cfg.cp_size
    lead = sig.shape[:-1]
    nsym = sig.shape[-1] // ol
    sym = sig.reshape(*lead, nsym, ol)
    ph = jnp.angle((jnp.conj(sym[..., :cp]) * sym[..., fft:]).sum(-1))
    theta = ph / fft                                         # [..., nsym]
    acc = jnp.cumsum(theta * ol, axis=-1) - theta * ol       # exclusive cumsum
    j = jnp.asarray(np.arange(ol), dtype=ph.dtype)
    ang = -(acc[..., None] + theta[..., None] * j)
    corr = jnp.exp(1j * ang.astype(sym.real.dtype)).astype(sym.dtype)
    return (sym * corr).reshape(*lead, nsym * ol)


def recover_fused(spec, sig: jnp.ndarray):
    """All four recovery stages in one pass: coarse pilot CFO + per-symbol CP
    CFO + common phase, applied as a SINGLE complex rotation.

    Algebraically identical to the sequential reference chain
    (`main.cpp:60-63`): the CP phase of a derotated symbol equals the raw CP
    phase rotated by e^{-2πi·f·fft} (the conj product shifts by a constant
    under derotation), and scalar phases cancel inside conj products — so all
    estimates can be made from the raw signal and composed into one per-sample
    angle.  Replaces three full-signal transcendental+HBM passes with one.

    Returns (corrected_sig, coarse_shift).
    """
    cfg = spec.cfg
    ol, fft, cp = cfg.ofdm_len, cfg.fft_size, cfg.cp_size
    lead = sig.shape[:-1]
    n = sig.shape[-1]
    nsym = n // ol
    rdt = sig.real.dtype

    shift = pilot_freq_shift(spec, sig)                      # [...]
    sym = sig.reshape(*lead, nsym, ol)
    raw = (jnp.conj(sym[..., :cp]) * sym[..., fft:]).sum(-1)  # [..., nsym]
    # derotation adds a constant -2π·shift·fft to each CP-product's phase
    off = (-2 * np.pi * fft) * shift
    rot = jnp.exp(1j * off.astype(rdt))[..., None].astype(sig.dtype)
    theta = jnp.angle(raw * rot) / fft                       # [..., nsym]
    acc = jnp.cumsum(theta * ol, axis=-1) - theta * ol       # exclusive
    j = jnp.asarray(np.arange(ol), dtype=rdt)
    a_sym = acc[..., None] + theta[..., None] * j            # [..., nsym, ol]
    narr = jnp.asarray(np.arange(n), dtype=rdt)
    angle = (2 * np.pi) * shift[..., None] * narr + a_sym.reshape(*lead, n)
    corr = jnp.exp(-1j * angle.astype(rdt)).astype(sig.dtype)
    # common phase vs the known preamble, measured on the corrected prefix
    pre = jnp.asarray(np.conj(spec.preamble_time), dtype=sig.dtype)
    L = pre.shape[0]
    p = jnp.angle((pre * sig[..., :L] * corr[..., :L]).sum(-1))
    scalar = jnp.exp(-1j * p.astype(rdt)).astype(sig.dtype)
    return sig * corr * scalar[..., None], shift


def common_phase_correct(spec, sig: jnp.ndarray) -> jnp.ndarray:
    """Common phase vs the known preamble (`OFDM/Frame.hpp:265-274`).
    sig [..., n] with the preamble at the front."""
    pre = jnp.asarray(np.conj(spec.preamble_time), dtype=sig.dtype)
    L = pre.shape[0]
    phase = jnp.angle((pre * sig[..., :L]).sum(-1))
    rot = jnp.exp(-1j * phase.astype(sig.real.dtype)).astype(sig.dtype)
    return sig * rot[..., None]
