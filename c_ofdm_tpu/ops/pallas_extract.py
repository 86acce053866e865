"""Pallas TPU kernel: batched frame-window extraction at traced offsets.

The RX chain's only irregular memory op: gather one contiguous window
[win] per capture row at a data-dependent start (the synchronizer's frame
position).  XLA lowers a vmapped ``dynamic_slice`` to a generic gather; this
kernel instead does a VMEM-local dynamic slice per grid row — each window
copy is a contiguous lane-shifted move, no gather engine involved.

Complex data is carried as separate real/imag float32 planes (Pallas TPU has
no native complex dtype); on TPU, XLA itself stores complex64 arrays as
separate planes, so the ``.real``/``.imag`` splits fuse away.

STATUS: in production — `models/rx.py::extract_sigs_rows/extract_sigs_single`
route through these kernels on TPU (spec.extract_backend "auto"/"pallas").
Measured 5.9x over the vmapped-dynamic_slice gather at the production shape
(0.122 vs 0.722 ms, B=256 win=5760, 193 GB/s effective — PERF.md); parity
tests in tests/test_streaming.py::test_pallas_extract_paths_match_xla.

Reference counterpart: the frame-window memcpy out of the RX ring
(`rx.cpp:192-198`).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_ROWS = 8  # sublane tile: f32 min tile is (8, 128)


def _extract_kernel(st_ref, xr_ref, xi_ref, yr_ref, yi_ref, *, win: int,
                    n_bits: int):
    """Per-row window extraction as n_bits FULL-WIDTH conditional rolls.

    out[r, j] = in[r, s_r + j]: each row needs a left-rotation by its own
    s_r.  The round-3 kernel did a (1, win+128) dynamic slice + roll per
    row — 8 serial ops each using one sublane (1/8 of the VPU), which made
    extraction the single most expensive stage of the flagship step
    (0.24 ms of 0.33; perf/sol.py round 5: 12% of HBM peak against a
    0.03 ms floor).  Here s_r is decomposed into bits and the whole (8, L)
    tile is rolled by 2^k lanes, keeping rows where bit k of s_r is set —
    n_bits full-width vector passes instead of 8 serial 1/8-width moves.
    n_bits = bit_length(max start) is tiny for the batch shape (starts are
    pre-clamped to n - win = 256 at the flagship geometry -> 9 passes).
    No wraparound garbage reaches the output: s_r + win <= n < L."""
    st = st_ref[...]                        # (8, 128) int32, lanes broadcast
    for ref, out in ((xr_ref, yr_ref), (xi_ref, yi_ref)):
        tile = ref[...]                     # (8, L)
        L = tile.shape[1]
        for k in range(n_bits):
            step = 1 << k
            rolled = pltpu.roll(tile, L - step, axis=1)   # left by step
            bit = (st >> k) & 1                           # (8, 128)
            tile = jnp.where(bit[:, :1] == 1, rolled, tile)
        out[...] = tile[:, :win]


@functools.partial(jax.jit, static_argnums=(3, 4))
def _extract_call(xr, xi, starts, win: int, interpret: bool):
    B, n = xr.shape
    pad = (-B) % _ROWS
    # lane padding only up to the 128-lane tile (zero at the flagship
    # geometry, n = 6016 = 47*128): the bit-roll kernel reads lane
    # s+j <= (n-win)+win = n at most (starts are pre-clamped to n-win), so
    # the old +128 margin — two extra ~12 MB materialized copies of the
    # capture per step — is unnecessary
    lpad = (-n) % 128
    if pad or lpad:
        zrow = [(0, pad), (0, lpad)]
        xr, xi = jnp.pad(xr, zrow), jnp.pad(xi, zrow)
        if pad:
            starts = jnp.pad(starts, (0, pad))
    n_lanes = n + lpad
    nb = (B + pad) // _ROWS
    max_start = max(n - win, 1)
    kern = functools.partial(_extract_kernel, win=win,
                             n_bits=max_start.bit_length())
    st_b = jnp.broadcast_to(starts.astype(jnp.int32)[:, None],
                            (B + pad, 128))
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((_ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, n_lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, n_lanes), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_ROWS, win), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, win), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B + pad, win), jnp.float32),
                   jax.ShapeDtypeStruct((B + pad, win), jnp.float32)],
        interpret=interpret,
    )(st_b, xr, xi)
    return out[0][:B], out[1][:B]


def _single_kernel(st_ref, xr_ref, xi_ref, yr_ref, yi_ref, tmp_ref, *,
                   win: int):
    """Like _extract_kernel but every window reads the SAME capture row —
    the streaming-ring case (K windows out of one 252k-sample ring).

    Ring starts span the whole ring (~18 bits), so the batch kernel's
    full-shift bit-roll would need rolls over an (8, ring) tile — far more
    VMEM traffic than the windows themselves.  Hybrid instead: the
    128-aligned part of each start is a per-row dynamic-slice COPY into a
    scratch tile (pure data movement), and only the sub-128 remainder is
    applied as 7 full-width conditional rolls — replacing the round-3
    per-row (1, L) rolls that used one sublane each."""
    base = pl.program_id(0) * _ROWS
    Lt = win + 128
    idx = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 1), 0)
    rem = jnp.zeros((_ROWS, 1), jnp.int32)
    for r in range(_ROWS):
        rem = rem + jnp.where(idx == r, st_ref[base + r] % 128, 0)
    for ref, out in ((xr_ref, yr_ref), (xi_ref, yi_ref)):
        for r in range(_ROWS):
            s = st_ref[base + r]
            q = pl.multiple_of((s // 128) * 128, 128)
            tmp_ref[r: r + 1, :] = ref[0:1, pl.ds(q, Lt)]
        tile = tmp_ref[...]
        for k in range(7):                   # rem < 128
            step = 1 << k
            rolled = pltpu.roll(tile, Lt - step, axis=1)  # left by step
            tile = jnp.where(((rem >> k) & 1) == 1, rolled, tile)
        out[...] = tile[:, :win]


@functools.partial(jax.jit, static_argnums=(3, 4))
def _extract_single_call(xr, xi, starts, win: int, interpret: bool):
    (n,) = xr.shape
    K = starts.shape[0]
    pad = (-K) % _ROWS
    xr = jnp.pad(xr, (0, 128))[None, :]
    xi = jnp.pad(xi, (0, 128))[None, :]
    if pad:
        starts = jnp.pad(starts, (0, pad))
    nb = (K + pad) // _ROWS
    kern = functools.partial(_single_kernel, win=win)
    out = pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n + 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n + 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_ROWS, win), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_ROWS, win), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((K + pad, win), jnp.float32),
                   jax.ShapeDtypeStruct((K + pad, win), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((_ROWS, win + 128), jnp.float32)],
        interpret=interpret,
    )(starts.astype(jnp.int32), xr, xi)
    return out[0][:K], out[1][:K]


# flat multi-channel extraction keeps the whole concatenated row in VMEM as
# 2 f32 planes.  The binding constraint is Mosaic's 16 MB SCOPED vmem limit
# per kernel (observed: a 7.65 M-sample flat row OOMed with "scoped
# allocation 58.55M, limit 16.00M"), not the chip's 128 MB physical VMEM:
# 2 planes x 4 B x samples <= 16 MB -> <= 2 M samples (C=8 reference rings
# = 2.02 M, the proven-working load)
_FLAT_MAX_SAMPLES = 2 << 20


def _extract_multi_call(xr, xi, starts, win: int, interpret: bool):
    """K windows out of EACH of C capture rows, in ONE kernel launch.

    The C rings are laid end-to-end in a single flat row (each padded by the
    kernel's 128-lane over-read margin) and the per-ring starts are offset by
    their ring's base — the proven single-row kernel then extracts all C*K
    windows in one grid.  Windows never cross ring boundaries: starts are
    pre-clamped to [0, n-win] per ring, and the widened aligned read tops out
    at start+win+128 <= n+128 == the ring's padded segment length.

    Round 3's fused (C, K/8)-grid variant hit three Mosaic tiling limits on
    real v5e — (1, n) VMEM blocks violating the (8, 128) sublane tile, C full
    ring rows exceeding VMEM, and 8-aligned DMA source-slice rules.
    Flattening sidesteps all three while still amortizing the launch: the
    flat row is exactly the single-ring shape the kernel already lowers, just
    longer.  Measured on v5e at the streaming shape (C=8, n=252 672, K=49,
    win=896): one launch replaces 8, taking the C=8 sfull stage from
    ~0.75 ms toward per-channel parity with C=1 (PERF.md round 4).

    Falls back to per-channel launches of the same kernel when the flat row
    would not fit VMEM (2 f32 planes are kept resident)."""
    C, n = xr.shape
    K = starts.shape[1]
    seg = n + 128
    cmax = max(_FLAT_MAX_SAMPLES // seg, 1)
    if C > cmax:
        # chunk channels into the largest flat groups that fit VMEM —
        # ceil(C/cmax) launches instead of C (round-5: the per-channel
        # fallback cost C=64 streaming 2.4x per-channel vs C=8)
        outs = [_extract_multi_call(xr[c0:c0 + cmax], xi[c0:c0 + cmax],
                                    starts[c0:c0 + cmax], win, interpret)
                for c0 in range(0, C, cmax)]
        return (jnp.concatenate([o[0] for o in outs]),
                jnp.concatenate([o[1] for o in outs]))
    xrf = jnp.pad(xr, ((0, 0), (0, 128))).reshape(C * seg)
    xif = jnp.pad(xi, ((0, 0), (0, 128))).reshape(C * seg)
    off = jnp.arange(C, dtype=jnp.int32)[:, None] * seg
    sf = (starts.astype(jnp.int32) + off).reshape(-1)
    yr, yi = _extract_single_call(xrf, xif, sf, win, interpret)
    return yr.reshape(C, K, win), yi.reshape(C, K, win)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def extract_windows(captures: jnp.ndarray, starts: jnp.ndarray,
                    win: int) -> jnp.ndarray:
    """captures [B, n] complex64, starts [B] int32 (pre-clamped to
    [0, n-win]) -> windows [B, win] complex64."""
    xr = captures.real.astype(jnp.float32)
    xi = captures.imag.astype(jnp.float32)
    yr, yi = _extract_call(xr, xi, starts, win, not _on_tpu())
    return (yr + 1j * yi).astype(jnp.complex64)


def extract_windows_single(capture: jnp.ndarray, starts: jnp.ndarray,
                           win: int) -> jnp.ndarray:
    """capture [n] complex64, starts [K] int32 (pre-clamped to [0, n-win])
    -> windows [K, win] complex64 — K windows out of one ring, all VMEM-local
    (the whole ring plane is ~1 MB, well under VMEM)."""
    xr = capture.real.astype(jnp.float32)
    xi = capture.imag.astype(jnp.float32)
    yr, yi = _extract_single_call(xr, xi, starts, win, not _on_tpu())
    return (yr + 1j * yi).astype(jnp.complex64)


def extract_windows_multi(captures: jnp.ndarray, starts: jnp.ndarray,
                          win: int) -> jnp.ndarray:
    """captures [C, n] complex64, starts [C, K] int32 (pre-clamped) ->
    windows [C, K, win] complex64 — K windows out of EACH of C rings (the
    multi-channel streaming case)."""
    xr = captures.real.astype(jnp.float32)
    xi = captures.imag.astype(jnp.float32)
    yr, yi = _extract_multi_call(xr, xi, starts, win, not _on_tpu())
    return (yr + 1j * yi).astype(jnp.complex64)


if __name__ == "__main__":
    # same-process A/B vs the XLA vmapped-dynamic_slice gather (immune to
    # relay-window drift): python -m c_ofdm_tpu.ops.pallas_extract
    import time

    B, n, win, K = 256, 6016, 5760, 8
    rng = np.random.default_rng(0)
    # staged as interleaved f32 (complex device_put is unimplemented on the
    # relayed TPU runtime); combined to complex64 on device per step
    pools = [jnp.asarray(rng.standard_normal((K, B, n, 2)).astype(np.float32))
             for _ in range(3)]
    starts = jnp.asarray(rng.integers(0, n - win, (K, B)), dtype=jnp.int32)

    def xla_extract(c, s):
        return jax.vmap(lambda cc, ss: jax.lax.dynamic_slice_in_dim(
            cc, ss, win))(c, s)

    def run_factory(fn):
        def run(pool, k):
            def body(i, acc):
                p = pool[i % K]
                c = p[..., 0] + 1j * p[..., 1]
                return acc + jnp.abs(fn(c, starts[i % K])).sum()
            return jax.lax.fori_loop(0, k, body, jnp.float32(0))
        return jax.jit(run)

    fns = {"xla_gather": run_factory(xla_extract),
           "pallas": run_factory(lambda c, s: extract_windows(c, s, win))}
    for name, f in fns.items():
        t0 = time.perf_counter()
        float(f(pools[0], 1))
        print(f"{name}: compile {time.perf_counter()-t0:.0f}s", flush=True)
    for name, f in fns.items():
        def timed(k):
            best = float("inf")
            for p in pools:
                t0 = time.perf_counter()
                float(f(p, k))
                best = min(best, time.perf_counter() - t0)
            return best
        t_lo, t_hi = timed(4), timed(100)
        per = (t_hi - t_lo) / 96
        gbs = B * win * 8 * 2 / per / 1e9
        print(f"{name}: {per*1e3:.3f} ms/step ({gbs:.0f} GB/s eff r+w)",
              flush=True)
