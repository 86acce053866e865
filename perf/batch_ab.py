"""Same-window A/B of the two flagship batch-step formulations:

  vmapped  — jax.vmap(receive_capture) over B captures (bench.py round-1
             form; the frame gather is a vmapped dynamic_slice -> XLA gather)
  batched  — receive_batch: scalar sync under vmap, then batch-native
             Pallas window extraction + one fused demod over [B, sig]

Two executables, one process, interleaved timing rounds — window drift
cancels.  Run: python perf/batch_ab.py
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

B, K, K_LO, K_HI, REPS = 256, 8, 4, 100, 3


def main():
    spec = make_frame_spec(ModemConfig(), dtype=jnp.complex64,
                           fft_backend="matmul")

    def step_vmapped(payload):
        frames = txm.transmit(spec, payload)
        res, s = jax.vmap(lambda c: rxm.receive_capture(spec, c))(frames)
        return (res.mac_bytes.astype(jnp.uint32).sum()
                + s.found.sum().astype(jnp.uint32))

    def step_batched(payload):
        frames = txm.transmit(spec, payload)
        res, s = rxm.receive_batch(spec, frames)
        return (res.mac_bytes.astype(jnp.uint32).sum()
                + s.found.sum().astype(jnp.uint32))

    def runner(step):
        def run(pool, k):
            return jax.lax.fori_loop(
                0, k, lambda i, acc: acc + step(pool[i % K]), jnp.uint32(0))
        return jax.jit(run)

    fns = {"vmapped": runner(step_vmapped), "batched": runner(step_batched)}
    rng = np.random.default_rng(7)
    pools = [jnp.asarray(rng.integers(0, 256, (K, B, spec.cfg.frame_bytes),
                                      dtype=np.uint8)) for _ in range(REPS)]
    for name, f in fns.items():
        t0 = time.perf_counter()
        v = int(f(pools[0], 1))
        print(f"{name}: compile {time.perf_counter()-t0:.0f}s (chk {v})",
              flush=True)

    def timed(f, k):
        best = float("inf")
        for p in pools:
            t0 = time.perf_counter()
            int(f(p, k))
            best = min(best, time.perf_counter() - t0)
        return best

    # interleaved rounds: window drift hits both variants equally
    best = {n: float("inf") for n in fns}
    for r in range(4):
        for name, f in fns.items():
            lo, hi = timed(f, K_LO), timed(f, K_HI)
            est = (hi - lo) / (K_HI - K_LO)
            best[name] = min(best[name], est)
            print(f"round {r} {name}: {est*1e3:.3f} ms/step", flush=True)
    for name, per in best.items():
        print(f"{name}: best {per*1e3:.3f} ms/step "
              f"({B*spec.cfg.frame_len/per/1e6:.0f} Msamples/s)", flush=True)


if __name__ == "__main__":
    main()
