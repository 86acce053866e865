"""Bit <-> symbol repacking as pure vectorized JAX ops.

TPU-native replacement for the reference's serial ``bit_stream_converter``
(`OFDM/modulation.cpp:90-125`): MSB-first within each block, arbitrary symbol
widths (handles symbols straddling byte boundaries, e.g. QAM64's 6-bit symbols).
All shapes are static; the batch dimension is leading.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def unpack_bits(data: jnp.ndarray) -> jnp.ndarray:
    """uint8 [..., n] -> [..., n*8] bits, MSB first."""
    shifts = np.arange(7, -1, -1, dtype=np.uint8)
    bits = (data[..., None] >> shifts) & 1
    return bits.reshape(*data.shape[:-1], data.shape[-1] * 8)


def pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """[..., n*8] bits -> uint8 [..., n], MSB first."""
    n = bits.shape[-1] // 8
    weights = (1 << np.arange(7, -1, -1)).astype(np.uint8)
    grouped = bits.reshape(*bits.shape[:-1], n, 8).astype(jnp.uint8)
    return (grouped * weights).sum(-1).astype(jnp.uint8)


def bytes_to_symbols(data: jnp.ndarray, bits_per_symbol: int) -> jnp.ndarray:
    """uint8 [..., nbytes] -> int32 [..., nbytes*8//bps] symbol indices, MSB first."""
    bits = unpack_bits(data)
    nsym = bits.shape[-1] // bits_per_symbol
    grouped = bits[..., : nsym * bits_per_symbol].reshape(
        *bits.shape[:-1], nsym, bits_per_symbol).astype(jnp.int32)
    weights = (1 << np.arange(bits_per_symbol - 1, -1, -1)).astype(np.int32)
    return (grouped * weights).sum(-1)


def symbols_to_bytes(symbols: jnp.ndarray, bits_per_symbol: int) -> jnp.ndarray:
    """int [..., nsym] -> uint8 [..., nsym*bps//8], MSB first."""
    shifts = np.arange(bits_per_symbol - 1, -1, -1, dtype=np.int32)
    bits = ((symbols[..., None] >> shifts) & 1)
    flat = bits.reshape(*symbols.shape[:-1], symbols.shape[-1] * bits_per_symbol)
    return pack_bits(flat)
