"""Perf experiments: per-component marginal step time on TPU.

Each variant is one executable (fori_loop trick from bench.py).  Run one
variant per invocation (each costs a ~1-5 min relay compile), or the whole
reproducible stage table in one command:

  python perf/perf_variants.py full|tx|demod|sync|full_matmul|full_pallas
  python perf/perf_variants.py stages    # the PERF.md stage-breakdown table
  python perf/perf_variants.py stream    # streaming ring path
"""
import sys

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from c_ofdm_tpu import ModemConfig, make_frame_spec
from c_ofdm_tpu.models import rx as rxm, tx as txm

import os
B = int(os.environ.get("PV_B", 256))
K = 8
K_LO = int(os.environ.get("PV_KLO", 4))
K_HI = int(os.environ.get("PV_KHI", 36))
REPS = int(os.environ.get("PV_REPS", 3))

# PV_CFG=wideband profiles the 8k-FFT QAM64 geometry (BASELINE config #3)
_CFGS = {
    "default": dict(),
    "wideband": dict(fft_size=8192, num_data_subc=4096, num_pilot_subc=32,
                     cp_size=1024, num_symb=2, pr_sin_len=512, mod_type=6),
}
CFG_KW = _CFGS[os.environ.get("PV_CFG", "default")]


def make_step(name):
    backend = {"full_matmul": "matmul", "full_pallas": "pallas",
               "full_bf16": "matmul_bf16"}.get(
                   name, os.environ.get("PV_BACKEND", "xla"))
    spec = make_frame_spec(ModemConfig(**CFG_KW), dtype=jnp.complex64,
                           fft_backend=backend,
                           extract_backend=os.environ.get("PV_EXTRACT",
                                                          "auto"))

    def tx_only(payload):
        return jnp.abs(txm.transmit(spec, payload)).sum().astype(jnp.uint32)

    from c_ofdm_tpu.ops import chanest as _ce, modulation as _mo

    def _tx_freq(payload):
        cfg = spec.cfg
        pts = _mo.map_bytes(payload, cfg.mod_type, dtype=spec.dtype)
        data = pts.reshape(*pts.shape[:-1], cfg.num_symb, cfg.num_data_subc)
        pilot = jnp.full((*data.shape[:-1], 1), cfg.pilot_ampl,
                         dtype=pts.dtype)
        zero = jnp.zeros_like(pilot)
        lookup = jnp.concatenate([pilot, data, zero], axis=-1)
        return lookup[..., jnp.asarray(_ce._tx_bin_maps(spec))]

    def txmap(payload):
        # constellation map only
        return jnp.abs(_mo.map_bytes(payload, spec.cfg.mod_type,
                                     dtype=spec.dtype)).sum().astype(jnp.uint32)

    def txfreq(payload):
        # map + frequency-domain assembly (the xla branch's bin-map gather)
        return jnp.abs(_tx_freq(payload)).sum().astype(jnp.uint32)

    def txifft(payload):
        # map + assembly + symbol IFFT (no CP/concat/burst)
        from c_ofdm_tpu.ops import fft as _fft
        time = _fft.ifft_unnorm(_tx_freq(payload), "xla")
        return jnp.abs(time).sum().astype(jnp.uint32)

    def demod(payload):
        frames = txm.transmit(spec, payload)
        return rxm.demod_frame(spec, frames).mac_bytes.astype(jnp.uint32).sum()

    def sync_only(payload):
        frames = txm.transmit(spec, payload)
        s = jax.vmap(lambda c: rxm.synchronize(spec, c).frame_start)(frames)
        return s.sum().astype(jnp.uint32)

    def full(payload):
        frames = txm.transmit(spec, payload)
        res, s = rxm.receive_batch(spec, frames)
        return res.mac_bytes.astype(jnp.uint32).sum() + s.found.sum().astype(jnp.uint32)

    def extract(payload):
        frames = txm.transmit(spec, payload)
        s = jax.vmap(lambda c: rxm.synchronize(spec, c))(frames)
        out = jax.vmap(lambda c, st: rxm.extract_frame(spec, c, st))(
            frames, s.frame_start)
        return jnp.abs(out).sum().astype(jnp.uint32)

    from c_ofdm_tpu.ops import cfo as cfoops, chanest as ce, modulation as modops

    def recover(payload):
        frames = txm.transmit(spec, payload)
        sig, shift = cfoops.recover_fused(spec, frames[..., spec.cfg.t2sin_size:])
        return (jnp.abs(sig).sum() + shift.sum()).astype(jnp.uint32)

    def pilotcfo(payload):
        frames = txm.transmit(spec, payload)
        shift = cfoops.pilot_freq_shift(spec, frames[..., spec.cfg.t2sin_size:])
        return (shift.sum() * 1e3).astype(jnp.uint32)

    def odemod(payload):
        cfg = spec.cfg
        frames = txm.transmit(spec, payload)
        sig = frames[..., cfg.t2sin_size + cfg.preamble_len:]
        msg = sig.reshape(*sig.shape[:-1], cfg.num_symb,
                          cfg.ofdm_len)[..., cfg.cp_size:]
        const = ce.ofdm_demodulate(spec, msg)
        return jnp.abs(const).sum().astype(jnp.uint32)

    def demap(payload):
        cfg = spec.cfg
        frames = txm.transmit(spec, payload)
        sig = frames[..., cfg.t2sin_size + cfg.preamble_len:]
        msg = sig.reshape(*sig.shape[:-1], cfg.num_symb,
                          cfg.ofdm_len)[..., cfg.cp_size:]
        const = ce.ofdm_demodulate(spec, msg)
        return modops.demap_bytes(const, cfg.mod_type).astype(jnp.uint32).sum()

    return {"tx": tx_only, "demod": demod, "sync": sync_only,
            "full": full, "full_matmul": full, "full_pallas": full,
            "full_bf16": full, "extract": extract, "recover": recover,
            "pilotcfo": pilotcfo, "odemod": odemod, "demap": demap,
            "txmap": txmap, "txfreq": txfreq, "txifft": txifft}[name], spec


def main(name):
    per, spec = _measure_variant(name)
    print(f"{name}: per-step {per*1e3:.3f} ms  "
          f"({B*spec.cfg.frame_len/per/1e6:.0f} Msamples/s)", flush=True)


def main_stages():
    """Reproducible PERF.md stage table: cumulative-pipeline variants under
    PV_BACKEND=matmul (the production backend), one compile each."""
    import os as _os
    _os.environ.setdefault("PV_BACKEND", "matmul")
    rows = []
    for name in ("tx", "sync", "extract", "recover", "odemod", "demap",
                 "full"):
        per, spec = _measure_variant(name)
        rows.append((name, per))
        print(f"  {name}: {per*1e3:.3f} ms", flush=True)
    print("\n| variant (cumulative pipeline prefix) | ms/step "
          f"(B={B}) | Msamples/s |", flush=True)
    print("|---|---|---|", flush=True)
    for name, per in rows:
        print(f"| {name} | {per*1e3:.3f} | "
              f"{B*spec.cfg.frame_len/per/1e6:.0f} |", flush=True)


def _measure_variant(name):
    step, spec = make_step(name)

    def run(pool, k):
        return jax.lax.fori_loop(
            0, k, lambda i, acc: acc + step(pool[i % K]), jnp.uint32(0))

    f = jax.jit(run)
    rng = np.random.default_rng(1)
    pools = [jnp.asarray(rng.integers(0, 256, (K, B, spec.cfg.frame_bytes),
                                      dtype=np.uint8)) for _ in range(REPS)]
    t0 = time.perf_counter()
    float(f(pools[0], 1))
    print(f"{name}: compile {time.perf_counter()-t0:.0f}s", flush=True)

    def timed(k):
        return min(_one(f, p, k) for p in pools)

    def _one(f, p, k):
        t0 = time.perf_counter()
        float(f(p, k))
        return time.perf_counter() - t0

    t_lo, t_hi = timed(K_LO), timed(K_HI)
    per = (t_hi - t_lo) / (K_HI - K_LO)
    return per, spec


def main_stream():
    """Sustained streaming-pipeline throughput (BASELINE config #5): lax.scan
    over ingest buffers with carry-state threading, 41-frame rings."""
    from c_ofdm_tpu.mac.mac import Mac
    from c_ofdm_tpu.models import streaming

    import os as _os
    rbs = int(_os.environ.get("PV_RING", 40))
    spec = make_frame_spec(ModemConfig(rx_buf_size=rbs), dtype=jnp.complex64,
                           fft_backend="matmul")
    cfg = spec.cfg
    buf_len = cfg.rx_buf_size * cfg.frame_len
    S = 4
    mac = Mac(frame_bytes=cfg.frame_bytes, spread=cfg.mod_type)
    rng = np.random.default_rng(0)
    n_frames = (S * buf_len) // cfg.frame_len
    payloads = rng.integers(0, 256, (n_frames, mac.payload), dtype=np.uint8)
    wire = mac.write(jnp.asarray(payloads), jnp.arange(n_frames, dtype=jnp.uint32))
    frames = np.asarray(txm.transmit(spec, wire)).reshape(-1)
    stream = np.zeros(S * buf_len, dtype=np.complex64)
    stream[:frames.size] = frames
    pool = jnp.asarray(stream.reshape(S, buf_len))

    def run(pool, k):
        def body(i, carry):
            state, acc = carry
            state, out = streaming.process_buffer(spec, state,
                                                  pool[i % S], rbs + 1)
            return state, acc + out.num_found
        st0 = streaming.init_state(spec)
        return jax.lax.fori_loop(0, k, body, (st0, jnp.int32(0)))[1]

    f = jax.jit(run)
    t0 = time.perf_counter()
    print("found (k=1):", int(f(pool, 1)), flush=True)
    print(f"stream: compile {time.perf_counter()-t0:.0f}s", flush=True)

    def timed(k, r):
        p = pool * np.complex64(1.0 + 1e-6 * r)
        t0 = time.perf_counter()
        v = int(f(p, k))
        return time.perf_counter() - t0

    t_lo = min(timed(K_LO, r) for r in range(REPS))
    t_hi = min(timed(K_HI, r) for r in range(REPS))
    per = (t_hi - t_lo) / (K_HI - K_LO)
    print(f"stream: per-buffer {per*1e3:.3f} ms "
          f"({buf_len/per/1e6:.0f} Msamples/s sustained, "
          f"{cfg.rx_buf_size/per:.0f} frames/s)", flush=True)


def stream_stage_fns(spec, max_frames, C=1):
    """Shared streaming-stage step functions over wire-format blocks
    ([..., n, 2] interleaved f32) — the single source of truth used by
    ``main_stream_stages`` AND ``perf/sol.py``, so stage censuses and
    stage measurements can never quietly diverge onto different graphs
    (round-5 review find: the copies had already drifted on C-awareness)."""
    from c_ofdm_tpu.models import streaming
    from c_ofdm_tpu.ops import sync as syncops

    cfg = spec.cfg

    def to_ring(p):
        blk = p[..., 0] + 1j * p[..., 1]
        zeros = jnp.zeros((*blk.shape[:-1], cfg.frame_len), blk.dtype)
        return jnp.concatenate([zeros, blk], axis=-1)

    def sgate(p):
        return syncops.t2_ratio_track_hop(spec, to_ring(p)).sum()

    def ssync(p):
        pos, val = streaming.gated_hits(spec, to_ring(p),
                                        jnp.asarray(0, jnp.int32), max_frames)
        return pos.sum().astype(jnp.float32) + val.sum()

    def sfull(p):
        st0 = streaming.init_state(spec, channels=C if C > 1 else 0)
        _, out = streaming.process_buffer(spec, st0, p, max_frames)
        return (out.num_found.astype(jnp.float32).sum()
                + out.mac_bytes.astype(jnp.float32).sum())

    return {"to_ring": to_ring, "sgate": sgate, "ssync": ssync,
            "sfull": sfull}


def main_stream_stages(which):
    """Streaming-path stage isolation on realistic rings (f32-interleaved
    pools, like bench.py --streaming):
      sgate  — overlapping-window t2 ratio track only
      ssync  — gated_hits (gate + candidate MF + dedup/compact)
      sdemod — frame extraction gathers + batched demod at fixed positions
      sfull  — full process_buffer (= bench --streaming step)

    PV_CHANNELS=C > 1 runs the same stages on [C]-lead channel-batched rings
    (the bench.py --channels C workload) — the round-4 tool for locating the
    C=8 per-channel efficiency loss.
    """
    import bench as benchmod
    from c_ofdm_tpu.models import streaming
    from c_ofdm_tpu.ops import sync as syncops

    C = int(os.environ.get("PV_CHANNELS", 1))
    spec = make_frame_spec(ModemConfig(), dtype=jnp.complex64,
                           fft_backend="matmul")
    cfg = spec.cfg
    S = 4
    max_frames = cfg.rx_buf_size + 1
    buf_len_ = cfg.rx_buf_size * cfg.frame_len
    pools = []
    for r in range(REPS):
        rings, n_frames = benchmod._make_rings(spec, S * C, seed=r)
        iq = np.stack([rings.real, rings.imag], axis=-1).astype(np.float32)
        if C > 1:
            iq = iq.reshape(C, S, buf_len_, 2).transpose(1, 0, 2, 3).copy()
        pools.append(jnp.asarray(iq))

    shared = stream_stage_fns(spec, max_frames, C)
    to_ring, sgate, ssync = (shared["to_ring"], shared["sgate"],
                             shared["ssync"])

    def sdemod(p):
        # production extract path (extract_sigs_ring = Pallas window kernel
        # on TPU) + batched demod at fixed positions
        from c_ofdm_tpu.models import rx as rxm
        ring = to_ring(p)
        starts = (jnp.arange(max_frames, dtype=jnp.int32)
                  * (ring.shape[-1] // max_frames))
        starts = jnp.clip(starts, 0, ring.shape[-1] - cfg.frame_len)
        starts = jnp.broadcast_to(starts, (*ring.shape[:-1], max_frames))
        sigs = rxm.extract_sigs_ring(spec, ring, starts)
        res = rxm.demod_sig(spec, sigs)
        return res.mac_bytes.astype(jnp.float32).sum()

    def sdemod_xla(p):
        # A/B: the vmapped-dynamic_slice gather the Pallas kernel replaced
        from c_ofdm_tpu.models import rx as rxm
        ring = to_ring(p)
        starts = (jnp.arange(max_frames, dtype=jnp.int32)
                  * (ring.shape[-1] // max_frames))
        starts = jnp.clip(starts, 0, ring.shape[-1] - cfg.frame_len)
        sigs = jax.vmap(lambda s: rxm.extract_sig(spec, ring, s))(starts)
        res = rxm.demod_sig(spec, sigs)
        return res.mac_bytes.astype(jnp.float32).sum()

    def stopk(p):
        # gated_hits minus the MF/dedup: track + peak select + top_k + sort
        ring = to_ring(p)
        track = syncops.t2_ratio_track_hop(spec, ring)
        K = max_frames + spec.cfg.t2_gate_slack
        hot = track > cfg.t2_gate_level
        lo = jnp.full((1,), -jnp.inf, track.dtype)
        prev = jnp.concatenate([lo, track[:-1]])
        nxt = jnp.concatenate([track[1:], lo])
        peak = jnp.logical_and(hot, jnp.logical_and(track >= prev,
                                                    track > nxt))
        vals = jnp.where(peak, track, -1.0)
        _, idx = jax.lax.top_k(vals, K)
        return jnp.sort(idx).sum().astype(jnp.float32)

    def sscan(p):
        # the 49-step advance-rule scan + slot compaction alone, on
        # synthetic candidate arrays derived cheaply from the input
        ring = to_ring(p)
        K = max_frames + spec.cfg.t2_gate_slack
        base = (ring.real[:K] > 0).astype(jnp.int32)
        pr = jnp.cumsum(jnp.full((K,), cfg.frame_len, jnp.int32)) + base
        found = jnp.ones((K,), bool)

        def dedup(cursor, x):
            p_, f_ = x
            ok = jnp.logical_and(f_, p_ >= cursor)
            return jnp.where(ok, p_ + cfg.message_len, cursor), ok
        _, accept = jax.lax.scan(dedup, jnp.zeros((), jnp.int32), (pr, found))
        arank = jnp.cumsum(accept.astype(jnp.int32))
        tgt = jnp.arange(1, max_frames + 1, dtype=jnp.int32)
        slot = (arank[None, :] < tgt[:, None]).sum(-1)
        return slot.sum().astype(jnp.float32)

    sfull = shared["sfull"]

    step = {"sgate": sgate, "ssync": ssync, "sdemod": sdemod,
            "sdemod_xla": sdemod_xla, "stopk": stopk, "sscan": sscan,
            "sfull": sfull}[which]

    def run(pool, k):
        return jax.lax.fori_loop(
            0, k, lambda i, acc: acc + step(pool[i % S]), jnp.float32(0))

    f = jax.jit(run)
    t0 = time.perf_counter()
    float(f(pools[0], 1))
    print(f"{which}: compile {time.perf_counter()-t0:.0f}s", flush=True)

    def timed(k):
        return min(_one(f, p, k) for p in pools)

    t_lo, t_hi = timed(K_LO), timed(K_HI)
    per = (t_hi - t_lo) / (K_HI - K_LO)
    buf_len = cfg.rx_buf_size * cfg.frame_len
    print(f"{which}: per-buffer {per*1e3:.3f} ms "
          f"({buf_len/per/1e6:.0f} Msamples/s)", flush=True)


def _one(f, p, k):
    t0 = time.perf_counter()
    float(f(p, k))
    return time.perf_counter() - t0


if __name__ == "__main__":
    if sys.argv[1] == "stream":
        main_stream()
    elif sys.argv[1] == "stages":
        main_stages()
    elif sys.argv[1].startswith("s") and sys.argv[1] in (
            "sgate", "ssync", "sdemod", "sdemod_xla", "stopk", "sscan",
            "sfull"):
        main_stream_stages(sys.argv[1])
    else:
        main(sys.argv[1])
