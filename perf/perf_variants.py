"""Perf experiments: per-component marginal step time on TPU.

Each variant is one executable (fori_loop trick from bench.py).  Run one
variant per invocation (each costs a ~4-5 min relay compile):

  python perf_variants.py full|tx|demod|sync|full_matmul|full_pallas
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from c_ofdm_tpu import ModemConfig, make_frame_spec
from c_ofdm_tpu.models import rx as rxm, tx as txm

import os
B = int(os.environ.get("PV_B", 256))
K = 8
K_LO = int(os.environ.get("PV_KLO", 4))
K_HI = int(os.environ.get("PV_KHI", 36))
REPS = int(os.environ.get("PV_REPS", 3))


def make_step(name):
    backend = {"full_matmul": "matmul", "full_pallas": "pallas",
               "full_bf16": "matmul_bf16"}.get(
                   name, os.environ.get("PV_BACKEND", "xla"))
    spec = make_frame_spec(ModemConfig(), dtype=jnp.complex64,
                           fft_backend=backend)

    def tx_only(payload):
        return jnp.abs(txm.transmit(spec, payload)).sum().astype(jnp.uint32)

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
            "pilotcfo": pilotcfo, "odemod": odemod, "demap": demap}[name], spec


def main(name):
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
    print(f"{name}: per-step {per*1e3:.3f} ms  "
          f"({B*spec.cfg.frame_len/per/1e6:.0f} Msamples/s)", flush=True)


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


if __name__ == "__main__":
    if sys.argv[1] == "stream":
        main_stream()
    else:
        main(sys.argv[1])
