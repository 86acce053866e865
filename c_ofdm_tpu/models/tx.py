"""Transmit chain: MAC-frame bytes -> frame IQ, batch-first.

Reference path: `FRAME_FORM::write` -> `OFDM_FORM::write` -> `FFT_FORM::write`
-> CP prepend -> int16 staging (`OFDM/Frame.cpp:185-198,235-237,249-256`,
`tx.cpp:32-40`).  Here the whole frame is one shape transform under jit; the
t2sin burst and preamble are trace-time constants concatenated per frame.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import chanest, modulation
from .frame import FrameSpec


def transmit(spec: FrameSpec, mac_bytes: jnp.ndarray) -> jnp.ndarray:
    """mac_bytes uint8 [..., frame_bytes] -> IQ [..., frame_len]."""
    cfg = spec.cfg
    points = modulation.map_bytes(mac_bytes, cfg.mod_type, dtype=spec.dtype)
    msg = chanest.ofdm_modulate(spec, points, cfg.num_symb)
    lead = mac_bytes.shape[:-1]
    msg = msg.reshape(*lead, cfg.message_len)
    burst = jnp.broadcast_to(jnp.asarray(spec.t2_burst, dtype=spec.dtype),
                             (*lead, cfg.t2sin_size))
    pre = jnp.broadcast_to(jnp.asarray(spec.preamble_time, dtype=spec.dtype),
                           (*lead, cfg.preamble_len))
    return jnp.concatenate([burst, pre, msg], axis=-1)


def to_int16(spec: FrameSpec, iq: jnp.ndarray) -> jnp.ndarray:
    """Float IQ -> interleaved int16 [..., 2*n] with C-style truncation toward
    zero (`FRAME_FORM::get_int16`, `OFDM/Frame.cpp:249-256`)."""
    scaled_re = jnp.trunc(iq.real * spec.cfg.mult)
    scaled_im = jnp.trunc(iq.imag * spec.cfg.mult)
    out = jnp.stack([scaled_re, scaled_im], axis=-1)
    return out.reshape(*iq.shape[:-1], iq.shape[-1] * 2).astype(jnp.int16)


def from_int16(spec: FrameSpec, raw: jnp.ndarray) -> jnp.ndarray:
    """Interleaved int16 [..., 2*n] -> complex IQ [..., n]
    (`FRAME_FORM::form_int16_to_double`, `OFDM/Frame.hpp:472-516`)."""
    f = raw.astype(spec.real_dtype)
    re = f[..., 0::2]
    im = f[..., 1::2]
    return (re + 1j * im).astype(spec.dtype)


@functools.partial(jax.jit, static_argnums=0)
def transmit_jit(spec: FrameSpec, mac_bytes: jnp.ndarray) -> jnp.ndarray:
    return transmit(spec, mac_bytes)
