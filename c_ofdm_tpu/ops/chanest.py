"""Channel estimation and equalization.

Two estimators matching the reference's pair (`OFDM/Frame.hpp:375-434`):

* ``chan_est_lq``   — linear-phase least-squares fit over the unwrapped phase
  of the lower half-band (timing-offset equalizer; the reference's production
  choice, `main.cpp:66`).
* ``chan_est_full`` — mean per-subcarrier complex ratio (full channel).

Plus the OFDM symbol-level pilot equalization that lives in ``FFT_FORM::read``
(`OFDM/Frame.cpp:73-96`), exposed here as ``ofdm_demodulate``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import fft as fftops


def ofdm_demodulate(spec, time_syms: jnp.ndarray) -> jnp.ndarray:
    """CP-stripped time symbols [..., nsym, fft] -> equalized segment-order
    points [..., nsym*num_data_subc].

    Pilot amplitude normalization (mean |pilot| over ALL symbols of the call)
    + per-segment division by (pilot / same pilot in symbol 0).
    """
    cfg = spec.cfg
    freq = fftops.fft_fwd(time_syms, getattr(spec, 'fft_backend', 'xla'))
    pil = freq[..., jnp.asarray(spec.pilot_bins)]            # [..., nsym, P]
    phys = jnp.abs(pil).mean(axis=(-1, -2)) / cfg.pilot_ampl  # [...]
    freq = freq / phys[..., None, None].astype(freq.dtype)
    pil = pil / phys[..., None, None].astype(pil.dtype)
    coef = pil / pil[..., 0:1, :]                            # vs symbol 0
    data = freq[..., jnp.asarray(spec.data_bins)]
    lead = data.shape[:-2]
    nsym = data.shape[-2]
    data = data.reshape(*lead, nsym, cfg.num_pilot_subc, cfg.segment_size)
    data = data / coef[..., None]
    return data.reshape(*lead, nsym * cfg.num_data_subc)


def _tx_bin_maps(spec):
    """Gather-based frequency-bin construction (TPU scatters are slow): each
    FFT bin reads from index ``src[bin]`` of [pilot_ampl, data..., 0]."""
    cfg = spec.cfg
    src = np.full(cfg.fft_size, 1 + cfg.num_data_subc, dtype=np.int32)  # zero slot
    src[spec.pilot_bins] = 0                                            # pilot slot
    src[spec.data_bins] = 1 + np.arange(cfg.num_data_subc, dtype=np.int32)
    return src


def ofdm_modulate(spec, points: jnp.ndarray, num_symb: int) -> jnp.ndarray:
    """Segment-order points [..., nsym*num_data_subc] -> time [..., nsym, ofdm_len]
    incl. CP (`OFDM/Frame.cpp:54-70,185-198`): pilots at pilot_ampl, backward
    FFT / sqrt(N), CP = copy of the symbol tail.

    The pilot/data scatter is expressed as a single gather through a
    precomputed per-bin source map (scatters lower poorly on TPU)."""
    cfg = spec.cfg
    lead = points.shape[:-1]
    data = points.reshape(*lead, num_symb, cfg.num_data_subc)
    pilot = jnp.full((*lead, num_symb, 1), cfg.pilot_ampl, dtype=points.dtype)
    zero = jnp.zeros((*lead, num_symb, 1), dtype=points.dtype)
    lookup = jnp.concatenate([pilot, data, zero], axis=-1)
    freq = lookup[..., jnp.asarray(_tx_bin_maps(spec))]
    time = fftops.ifft_unnorm(freq, getattr(spec, 'fft_backend', 'xla')) / np.sqrt(cfg.fft_size)
    return jnp.concatenate([time[..., -cfg.cp_size:], time], axis=-1)


def unwrap_one_step(phase: jnp.ndarray) -> jnp.ndarray:
    """The reference's non-accumulating unwrap (`OFDM/Frame.hpp:407-414`):
    each element shifted by at most ±2π relative to its corrected predecessor.
    Scans along the last axis; leading dims are vectorized lanes."""
    x = jnp.moveaxis(phase, -1, 0)

    def step(prev, cur):
        d = cur - prev
        cur = jnp.where(d > np.pi, cur - 2 * np.pi,
                        jnp.where(d < -np.pi, cur + 2 * np.pi, cur))
        return cur, cur

    _, out = jax.lax.scan(step, x[0], x[1:])
    out = jnp.concatenate([x[:1], out], axis=0)
    return jnp.moveaxis(out, 0, -1)


def unwrap_fast(phase: jnp.ndarray) -> jnp.ndarray:
    """Standard accumulating unwrap via diff+round+cumsum — fully parallel
    (no sequential scan; the 127-step scan above costs more than the rest of
    the channel estimator on TPU).  Identical to ``unwrap_one_step`` whenever
    successive corrected differences stay within 3π, which holds for any
    physical timing offset this modem can sync to."""
    d = jnp.diff(phase, axis=-1)
    k = jnp.round(d / (2 * np.pi))
    corr = jnp.cumsum(k, axis=-1) * (2 * np.pi)
    return jnp.concatenate([phase[..., :1], phase[..., 1:] - corr], axis=-1)


def chan_est_lq(spec, preamble_sig: jnp.ndarray,
                exact_unwrap: bool = False) -> jnp.ndarray:
    """Linear-phase LS estimate over the lower half-band, mirrored to the upper
    half (`OFDM/Frame.hpp:389-434`).  Reproduces the reference's exact fit
    formula (sums where a standard LS uses means).
    preamble_sig [..., preamble_len] -> chan [..., num_data_subc]."""
    cfg = spec.cfg
    lead = preamble_sig.shape[:-1]
    syms = preamble_sig.reshape(*lead, cfg.num_pr_symb, cfg.ofdm_len)[..., cfg.cp_size:]
    pr = ofdm_demodulate(spec, syms)
    mod_pre = jnp.asarray(spec.preamble_points, dtype=pr.dtype)
    half = cfg.num_data_subc // 2
    unwrap = unwrap_one_step if exact_unwrap else unwrap_fast
    phase = unwrap(jnp.angle(pr[..., :half] / mod_pre[:half]))
    i = jnp.asarray(np.arange(half), dtype=phase.dtype)
    sx, sxx = i.sum(), (i * i).sum()
    sy = phase.sum(-1)
    sxy = (phase * i).sum(-1)
    b = (sxy - sx * sy) / (sxx - sx * sx)
    a = sy - b * sx
    n = cfg.num_data_subc
    k = np.arange(n)
    karr = jnp.asarray(np.where(k < half, k, k - n) +
                       (0 if n == 2 * half else n - 2 * half), dtype=phase.dtype)
    ang = b[..., None] * karr + a[..., None]
    return jnp.exp(1j * ang.astype(phase.dtype)).astype(preamble_sig.dtype)


def chan_est_full(spec, preamble_sig: jnp.ndarray) -> jnp.ndarray:
    """Mean per-subcarrier complex ratio (`OFDM/Frame.hpp:375-385`)."""
    cfg = spec.cfg
    lead = preamble_sig.shape[:-1]
    syms = preamble_sig.reshape(*lead, cfg.num_pr_symb, cfg.ofdm_len)[..., cfg.cp_size:]
    pr = ofdm_demodulate(spec, syms)
    mod_pre = jnp.asarray(spec.preamble_points, dtype=pr.dtype)
    ratio = (pr / mod_pre).reshape(*lead, cfg.num_pr_symb, cfg.num_data_subc)
    return ratio.mean(axis=-2)


def equalize(spec, points: jnp.ndarray, chan: jnp.ndarray) -> jnp.ndarray:
    """Divide message points [..., nsym*D] by the tiled channel estimate
    [..., D] (`main.cpp:69-71`)."""
    nsym = points.shape[-1] // chan.shape[-1]
    tiled = jnp.tile(chan, (*([1] * (chan.ndim - 1)), nsym))
    return points / tiled
