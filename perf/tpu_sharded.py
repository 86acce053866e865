"""Sharded receiver on the real chip (round-2 verdict gap #3).

The shard_map executable (`parallel/sharded.py`) had only ever compiled on
the virtual CPU mesh.  This script runs `make_sharded_receiver` on a
{channel:1, time:1} mesh on the real TPU:

  1. parity — the sharded executable must decode the committed golden OTA
     ring to the same frame positions and War-and-Peace payload as the
     unsharded path (tpu_smoke part 1: t2 10752, preamble 11040);
  2. the Pallas window-extract path inside shard_map (gated_hits routes
     candidate regions and the default `extract_backend="auto"` resolves to
     Pallas on TPU) must compile within the relay budget — the compile time
     is printed as the verdict on `parallel/sharded.py`'s old caveat;
  3. per-step time via two trip counts of repeated dispatch on distinct
     inputs, reported next to the unsharded streaming buffer time for the
     shard_map overhead.

Reference counterpart of the semantics: the ring walk `rx.cpp:147-156`
(single process); the mesh/halo design is green-field TPU (SURVEY §5.7).

Run on the TPU:  python perf/tpu_sharded.py
"""

import sys
import time

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

REF = "/root/reference"


def main():
    from c_ofdm_tpu import ModemConfig, make_frame_spec
    from c_ofdm_tpu.mac.mac import Mac
    from c_ofdm_tpu.parallel.mesh import make_modem_mesh
    from c_ofdm_tpu.parallel import sharded

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)

    spec = make_frame_spec(ModemConfig(), dtype=jnp.complex64,
                           fft_backend="matmul")
    cfg = spec.cfg
    mac = Mac(frame_bytes=cfg.frame_bytes, spread=cfg.mod_type)

    d = np.fromfile(f"{REF}/data/data.bin", dtype=np.float64)
    cap = (d[::2] + 1j * d[1::2]).astype(np.complex64)
    with open(f"{REF}/data.txt", "rb") as f:
        want = f.read()

    mesh = make_modem_mesh(n_channel=1, n_time=1, devices=jax.devices()[:1])
    recv = sharded.make_sharded_receiver(spec, mesh, max_frames_per_block=8)

    # complex device_put is unimplemented on the relayed runtime: wrap the
    # sharded receiver so IQ goes up as interleaved f32 and only real/uint8
    # come back (mac deframing stays on device)
    @jax.jit
    def step(raw):
        c = (raw[..., 0] + 1j * raw[..., 1]).astype(spec.dtype)
        out = recv(c)
        frs = mac.read_soft(out.diag)
        return (out.positions, out.valid, out.num_found,
                frs.payload, frs.valid)

    raw = jnp.asarray(np.stack([cap.real, cap.imag], -1)
                      .astype(np.float32)[None])        # [1, n, 2]
    t0 = time.perf_counter()
    pos, valid, nf, payloads, crc_ok = jax.tree.map(np.asarray, step(raw))
    compile_s = time.perf_counter() - t0
    print(f"sharded step (Pallas extract under shard_map): "
          f"compile+run {compile_s:.0f}s", flush=True)

    # parity with the unsharded path on the same ring
    n_found = int(nf.sum())
    hits = pos[valid]
    print(f"  decoded {n_found} frames at ring positions {hits.tolist()}",
          flush=True)
    assert n_found >= 1 and 11040 in hits.tolist(), (n_found, hits)
    k = np.nonzero(valid.reshape(-1))[0][0]
    got = payloads.reshape(-1, payloads.shape[-1])[k].tobytes()
    assert got == want[:len(got)], got[:60]
    assert bool(crc_ok.reshape(-1)[k])
    print(f"  payload OK on TPU via shard_map: {got[8:46]!r}...", flush=True)

    # channel-sharded CONTINUOUS streaming on the chip: same golden ring fed
    # as one buffer through make_sharded_streaming on a {channel:1} mesh —
    # state-threaded shard_map around process_buffer must decode identically
    from c_ofdm_tpu.models import streaming

    stream_step = sharded.make_sharded_streaming(spec, mesh, 8)

    @jax.jit
    def sstep(raw):
        st0 = streaming.init_state(spec, channels=1)
        c = (raw[..., 0] + 1j * raw[..., 1]).astype(spec.dtype)
        st, out = stream_step(st0, c)
        frs = mac.read_soft(out.diag)
        return out.positions, out.valid, frs.payload, frs.valid

    t0 = time.perf_counter()
    spos, svalid, spl, sok = jax.tree.map(np.asarray, sstep(raw))
    print(f"sharded streaming step: compile+run {time.perf_counter()-t0:.0f}s",
          flush=True)
    shits = spos[svalid]
    # ring = carry(frame_len zeros) + capture, so positions sit one
    # frame_len above the bulk receiver's block-local ones
    assert 11040 + cfg.frame_len in shits.tolist(), shits
    k = np.nonzero(svalid.reshape(-1))[0][0]
    got_s = spl.reshape(-1, spl.shape[-1])[k].tobytes()
    assert got_s == want[:len(got_s)] and bool(sok.reshape(-1)[k])
    print(f"  sharded STREAMING payload OK on TPU: {got_s[8:40]!r}...",
          flush=True)

    # amortized per-step time (round-4 verdict task 5): the same device-side
    # fori_loop marginal-time harness as bench.py — a traced trip count and
    # distinct per-step inputs — so the ~30-50 ms relay dispatch RTT that the
    # old back-to-back-dispatch measurement bundled in (0.627 ms/step, round
    # 3) is amortized away.  An unsharded process_buffer step runs in the
    # SAME harness in the same window, so the reported shard_map overhead is
    # window-drift-free.
    S = 4
    pool_np = np.stack([np.stack([cap.real, cap.imag], -1)
                        .astype(np.float32) * np.float32(1.0 + 1e-6 * r)
                        for r in range(S)])               # [S, n, 2]
    pool = jnp.asarray(pool_np)

    def run_sharded(p, k, salt):
        def body(i, acc):
            c = (p[i % S, ..., 0] + 1j * p[i % S, ..., 1]).astype(spec.dtype)
            out = recv(c[None])
            return (acc + out.num_found.sum().astype(jnp.uint32)
                    + jnp.where(out.valid, out.positions, 0)
                    .sum().astype(jnp.uint32))
        return jax.lax.fori_loop(0, k, body, salt)

    def run_plain(p, k, salt):
        def body(i, acc):
            st0 = streaming.init_state(spec)
            _, out = streaming.process_buffer(spec, st0, p[i % S], 8)
            return (acc + out.num_found.astype(jnp.uint32)
                    + jnp.where(out.valid, out.positions, 0)
                    .sum().astype(jnp.uint32))
        return jax.lax.fori_loop(0, k, body, salt)

    salt_ctr = iter(range(1, 1 << 30))
    results = {}
    for name, fn in (("sharded{1,1}", run_sharded), ("plain", run_plain)):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        float(f(pool, 1, jnp.uint32(next(salt_ctr))))
        print(f"  {name}: compile {time.perf_counter()-t0:.0f}s", flush=True)

        def timed(k):
            # a fresh salt per dispatch defeats the relay's identical-call
            # memoization (see bench.measure)
            best = float("inf")
            for r in range(3):
                p = pool * np.float32(1.0 + 1e-7 * r)
                t0 = time.perf_counter()
                float(f(p, k, jnp.uint32(next(salt_ctr))))
                best = min(best, time.perf_counter() - t0)
            return best

        # the golden-ring step is light (~0.1 ms), so the trip-count spread
        # must be large enough that the marginal dwarfs dispatch RTT noise
        per = min((timed(1000) - timed(10)) / 990 for _ in range(3))
        results[name] = per
        print(f"  {name}: marginal {per*1e3:.3f} ms/step "
              f"({cap.size/per/1e6:.0f} Msamples/s)", flush=True)
    ovh = results["sharded{1,1}"] / results["plain"] - 1.0
    print(f"  shard_map overhead vs plain (same window, amortized): "
          f"{100*ovh:+.1f}%", flush=True)
    print("TPU SHARDED: ALL OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
