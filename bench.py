"""Benchmark: full TX+RX chain throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's compute-bound 25.0 Msamples/s on one x86 core
(BASELINE.md; LOG.txt mean 240.5 us per 6016-sample frame, full rx chain).

The measured step matches the reference's per-frame work end-to-end:
payload bytes -> QAM map -> pilot scatter -> batched IFFT -> CP -> frame
assembly -> two-tone detect -> preamble matched-filter sync -> coarse pilot
CFO -> derotation -> per-symbol CP CFO -> common phase -> LS channel est ->
batched FFT + pilot equalization -> hard demap -> bytes.

Measurement notes for this environment: the TPU sits behind a relay where
(a) every compiled executable costs minutes of remote compile, (b) repeated
identical dispatches are memoized, and (c) block_until_ready is unreliable.
So: ONE executable total — a device-side fori_loop whose trip count is a
*traced* argument — timed at two trip counts with distinct per-step inputs
(step i consumes pool[i mod K]), forced host readback of a data-dependent
checksum, and the marginal time (t_hi - t_lo)/(k_hi - k_lo) reported.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_SAMPLES_PER_S = 25.0e6


def build_runner(spec, K):
    from c_ofdm_tpu.models import rx as rxm
    from c_ofdm_tpu.models import tx as txm

    def step(payload):
        frames = txm.transmit(spec, payload)
        res, s = jax.vmap(lambda c: rxm.receive_capture(spec, c))(frames)
        return (res.mac_bytes.astype(jnp.uint32).sum()
                + s.found.sum().astype(jnp.uint32))

    def run(pool, k):
        def body(i, acc):
            return acc + step(pool[i % K])
        return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

    return jax.jit(run)


def bench(spec, B=256, K=8, k_lo=4, k_hi=100, reps=4):
    f = build_runner(spec, K)
    rng = np.random.default_rng(B)
    t0 = time.perf_counter()
    pools = [jnp.asarray(rng.integers(0, 256, (K, B, spec.cfg.frame_bytes),
                                      dtype=np.uint8)) for _ in range(reps)]
    float(f(pools[0], 1))   # the single compile
    print(f"compile: {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)

    def timed(k):
        best = float("inf")
        for p in pools:      # distinct data per rep defeats memoization
            t0 = time.perf_counter()
            float(f(p, k))   # forced readback
            best = min(best, time.perf_counter() - t0)
        return best

    # several measurement rounds (same executable — cheap): the relay window
    # quality drifts minute-to-minute, keep the best marginal estimate
    per_step = float("inf")
    for r in range(3):
        t_lo = timed(k_lo)
        t_hi = timed(k_hi)
        est = max((t_hi - t_lo) / (k_hi - k_lo), 1e-9)
        print(f"round {r}: t({k_lo})={t_lo*1e3:.1f}ms t({k_hi})={t_hi*1e3:.1f}ms "
              f"-> {est*1e3:.3f} ms/step", file=sys.stderr, flush=True)
        per_step = min(per_step, est)
    return B * spec.cfg.frame_len / per_step, per_step


def main():
    from c_ofdm_tpu import ModemConfig, make_frame_spec

    spec = make_frame_spec(ModemConfig(), dtype=jnp.complex64,
                           fft_backend="matmul")
    B = 256
    sps, per = bench(spec, B)
    print(f"B={B}: {sps/1e6:.1f} Msamples/s ({per*1e3:.3f} ms/step)",
          file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "ofdm_tx_rx_samples_per_s_per_chip",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / BASELINE_SAMPLES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
