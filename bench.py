"""Benchmark: full TX+RX chain throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's compute-bound 25.0 Msamples/s on one x86 core
(BASELINE.md; LOG.txt mean 240.5 us per 6016-sample frame, full rx chain).

The measured step matches the reference's per-frame work end-to-end:
payload bytes -> QAM map -> pilot scatter -> batched IFFT -> CP -> frame
assembly -> two-tone detect -> preamble matched-filter sync -> coarse pilot
CFO -> derotation -> per-symbol CP CFO -> common phase -> LS channel est ->
batched FFT + pilot equalization -> hard demap -> bytes.

Measurement method: the TPU here sits behind a relay with ~30 ms round-trip
latency, unreliable block_until_ready, and execution memoization of repeated
identical dispatches.  We therefore (a) run K steps *inside one executable*
via lax.map over distinct inputs, (b) force a host readback of a
data-dependent checksum, and (c) report the marginal per-step time
(t(K) - t(1)) / (K - 1), taking the best of several repetitions with
perturbed inputs.
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

BASELINE_SAMPLES_PER_S = 25.0e6


def build_many_step(spec):
    from c_ofdm_tpu.models import rx as rxm
    from c_ofdm_tpu.models import tx as txm

    def step(payload):
        frames = txm.transmit(spec, payload)
        res, s = jax.vmap(lambda c: rxm.receive_capture(spec, c))(frames)
        return res.mac_bytes.astype(jnp.uint32).sum() + s.found.sum()

    return jax.jit(lambda pool: jax.lax.map(step, pool).sum())


def _timed(f, pool, reps):
    best = float("inf")
    for r in range(reps):
        p = (pool + np.uint8(2 * r + 1)).astype(jnp.uint8)
        float(p.sum())                      # materialize input
        t0 = time.perf_counter()
        float(f(p))                          # forced readback
        best = min(best, time.perf_counter() - t0)
    return best


def bench_batch(spec, B, k_lo=4, k_hi=36, reps=3):
    """Marginal per-step time between two device-side loop lengths — exactly
    two executables to compile (relay compiles cost ~90 s each)."""
    f = build_many_step(spec)
    rng = np.random.default_rng(B)
    pool_lo = jnp.asarray(rng.integers(0, 256, (k_lo, B, spec.cfg.frame_bytes),
                                       dtype=np.uint8))
    pool_hi = jnp.asarray(rng.integers(0, 256, (k_hi, B, spec.cfg.frame_bytes),
                                       dtype=np.uint8))
    float(f(pool_lo))                        # compile
    float(f(pool_hi))
    t_lo = _timed(f, pool_lo, reps)
    t_hi = _timed(f, pool_hi, reps)
    per_step = max((t_hi - t_lo) / (k_hi - k_lo), 1e-9)
    return B * spec.cfg.frame_len / per_step, per_step


def main():
    from c_ofdm_tpu import ModemConfig, make_frame_spec

    spec = make_frame_spec(ModemConfig(), dtype=jnp.complex64)
    B = 256
    sps, per = bench_batch(spec, B)
    print(f"B={B}: {sps/1e6:.1f} Msamples/s ({per*1e3:.3f} ms/step)",
          file=sys.stderr)
    print(json.dumps({
        "metric": "ofdm_tx_rx_samples_per_s_per_chip",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / BASELINE_SAMPLES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
