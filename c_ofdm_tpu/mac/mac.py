"""MAC framing layer.

The reference includes `mac/mac_frame.hpp` (`main.cpp:18`, `rx.cpp:17`) but the
file was never committed; its wire format was reverse-engineered from the
committed capture (`data/constell.bin` + `data.txt`):

* a logical MAC frame of ``frame_bytes / spread`` bytes: an 8-byte header
  ``[tx_id u8][rx_id u8][seq u32 BE][tail u16]`` followed by the payload
  (248 bytes at the reference config);
* each bit is then repeated ``spread`` times (spread = mod_type = 4 in the
  capture), so every constellation symbol carries one payload bit on the QAM
  diagonal — decoded optimally as ``sign(re + im)``;
* the observed tail is the constant ``0x7E57``; it is not a CRC of anything in
  the frame.  We transmit a real CRC16-CCITT over header+payload by default
  (``crc=True``) and accept either on read, adding the per-frame validation
  the reference evidently lacks (accuracy there is only measured statistically,
  `main.cpp:86-104`).

Everything is vectorized JAX (batch leading); byte-level ops on uint8.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..ops import bits as bitops

MAGIC = 0x7E57
HEADER_BYTES = 8

# CRC16-CCITT (poly 0x1021, init 0xFFFF) lookup table, baked as a constant.
_CRC_TABLE = np.zeros(256, dtype=np.uint16)
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x1021) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC_TABLE[_b] = _c


def crc16(data: jnp.ndarray) -> jnp.ndarray:
    """CRC16-CCITT over the last axis of uint8 [..., n] -> uint16 [...]."""
    import jax

    table = jnp.asarray(_CRC_TABLE.astype(np.uint32))
    x = data.astype(jnp.uint32)

    def step(crc, byte):
        idx = ((crc >> 8) ^ byte) & 0xFF
        return ((crc << 8) & 0xFFFF) ^ table[idx], None

    init = jnp.full(data.shape[:-1], 0xFFFF, dtype=jnp.uint32)
    crc, _ = jax.lax.scan(step, init, jnp.moveaxis(x, -1, 0))
    return crc.astype(jnp.uint16)


class MacFrame(NamedTuple):
    payload: jnp.ndarray   # uint8 [..., payload_bytes]
    tx_id: jnp.ndarray     # uint8 [...]
    rx_id: jnp.ndarray     # uint8 [...]
    seq: jnp.ndarray       # uint32 [...]
    valid: jnp.ndarray     # bool [...]  (tail matches CRC or MAGIC)


@dataclasses.dataclass(frozen=True)
class Mac:
    """MAC codec for a fixed over-the-air frame size.

    ``frame_bytes`` is the PHY frame capacity (`FRAME_FORM::usefull_size`,
    1024 at the reference config); ``spread`` the bit-repetition factor.
    """

    tx_id: int = 1
    rx_id: int = 0
    frame_bytes: int = 1024
    spread: int = 4
    crc: bool = True

    def __post_init__(self):
        if self.frame_bytes % self.spread:
            raise ValueError("frame_bytes must be divisible by spread")
        if self.logical_bytes <= HEADER_BYTES:
            raise ValueError("frame too small for MAC header")

    @property
    def logical_bytes(self) -> int:
        return self.frame_bytes // self.spread

    @property
    def payload(self) -> int:
        """Usable payload bytes per frame (reference ``mac.payload``)."""
        return self.logical_bytes - HEADER_BYTES

    # ---- encode ----

    def write(self, payload: jnp.ndarray, seq: jnp.ndarray) -> jnp.ndarray:
        """payload uint8 [..., payload], seq uint32 [...] -> uint8
        [..., frame_bytes] ready for the PHY."""
        lead = payload.shape[:-1]
        seq = jnp.broadcast_to(jnp.asarray(seq, dtype=jnp.uint32), lead)
        hdr = jnp.stack([
            jnp.full(lead, self.tx_id, dtype=jnp.uint8),
            jnp.full(lead, self.rx_id, dtype=jnp.uint8),
            (seq >> 24).astype(jnp.uint8),
            (seq >> 16).astype(jnp.uint8),
            (seq >> 8).astype(jnp.uint8),
            seq.astype(jnp.uint8),
        ], axis=-1)
        body = jnp.concatenate([hdr, payload.astype(jnp.uint8)], axis=-1)
        if self.crc:
            tail = crc16(body)
        else:
            tail = jnp.full(lead, MAGIC, dtype=jnp.uint16)
        tail8 = jnp.stack([(tail >> 8).astype(jnp.uint8),
                           tail.astype(jnp.uint8)], axis=-1)
        logical = jnp.concatenate([hdr, tail8, payload.astype(jnp.uint8)], axis=-1)
        # header layout on the wire: [tx rx seq4][tail2] then payload --
        # matching the observed capture (tail at bytes 6..7)
        if self.spread == 1:
            return logical
        lbits = bitops.unpack_bits(logical)
        sbits = jnp.repeat(lbits, self.spread, axis=-1)
        return bitops.pack_bits(sbits)

    # ---- decode ----

    def read_bytes(self, frame: jnp.ndarray) -> MacFrame:
        """Hard-decision path: frame uint8 [..., frame_bytes] (PHY demod
        output) -> MacFrame.  Bit groups are majority-voted."""
        if self.spread == 1:
            logical = frame
        else:
            fbits = bitops.unpack_bits(frame)
            lead = fbits.shape[:-1]
            groups = fbits.reshape(*lead, -1, self.spread)
            logical = bitops.pack_bits(
                (groups.sum(-1) * 2 > self.spread).astype(jnp.uint8))
        return self._parse(logical)

    def read_soft(self, diag_metric: jnp.ndarray) -> MacFrame:
        """ML path for the diagonal-spread scheme: ``diag_metric`` is
        re+im per constellation symbol, [..., nsym] with nsym == logical bits.
        (This is what makes the capture decode exactly; the reference's own
        mac.read evidently did the equivalent.)"""
        bits = (diag_metric > 0).astype(jnp.uint8)
        logical = bitops.pack_bits(bits)
        return self._parse(logical)

    def read_llr(self, llrs: jnp.ndarray) -> MacFrame:
        """Soft-combining path: max-log LLRs (``ops.modulation.soft_llrs``,
        [..., nsym, bits_per_sym]) -> each logical bit's ``spread`` wire
        copies' LLRs summed -> sign decision.  Optimal for the repetition
        scheme (vs the hard majority vote of ``read_bytes``, which discards
        per-copy confidence); measured ~1.5 dB at spread 4 on QAM16
        (tests/test_mac_channel.py, apps/ber_sweep --soft).  Positive LLR
        favors bit 0 (soft_llrs convention)."""
        lead = llrs.shape[:-2]
        wire = llrs.reshape(*lead, -1)              # wire-bit LLRs, in order
        groups = wire.reshape(*lead, -1, self.spread).sum(-1)
        bits = (groups < 0).astype(jnp.uint8)
        return self._parse(bitops.pack_bits(bits))

    def _parse(self, logical: jnp.ndarray) -> MacFrame:
        tx = logical[..., 0]
        rx = logical[..., 1]
        seq = (logical[..., 2].astype(jnp.uint32) << 24) | \
              (logical[..., 3].astype(jnp.uint32) << 16) | \
              (logical[..., 4].astype(jnp.uint32) << 8) | \
              logical[..., 5].astype(jnp.uint32)
        tail = (logical[..., 6].astype(jnp.uint32) << 8) | logical[..., 7].astype(jnp.uint32)
        payload = logical[..., HEADER_BYTES:]
        body = jnp.concatenate([logical[..., :6], payload], axis=-1)
        want = crc16(body).astype(jnp.uint32)
        valid = jnp.logical_or(tail == want, tail == MAGIC)
        return MacFrame(payload, tx, rx, seq, valid)
