"""Same-window A/B: r03 streaming code vs HEAD (verdict-r04 task 1).

Round 4's driver capture put the production streaming step at 0.099 ms/buffer
(96.7x baseline) where round 3's driver recorded 0.080 ms (119.7x).  Between
those rounds BOTH the harness (k_hi 60->160, salted dispatches) and the code
(structured rx_split_bins replacing the RX bin gather, peak-refine sync
plumbing, flat multi-ring extraction context) changed, so the drop could be
window drift, harness, or a real code regression.  This tool separates them:

  * two persistent worker processes — one importing the r03 package tree
    (git worktree at ae299f1), one importing HEAD — each compile the SAME
    salted fori_loop streaming runner over the SAME pool data (generated
    once, shipped as .npz);
  * the parent interleaves timing rounds A,B,A,B,... within one relay
    window, so both variants see the same minute-scale window quality;
  * each worker reports a SHA-256 fingerprint of its lowered stablehlo:
    identical fingerprints would prove the graphs never diverged.

Usage:  python perf/streaming_ab.py [--rounds 6] [--k-hi 160]
        (expects the r03 worktree at /tmp/wt_r03: git worktree add /tmp/wt_r03 ae299f1)

Reference workload being timed: the streaming RX ring loop
(`/root/reference/rx.cpp:94-237`).
"""

import argparse
import os
import subprocess
import sys
import time

K_LO_DEFAULT = 4
K_HI_DEFAULT = 160
POOLS_PATH = "/tmp/ab_pools.npz"
WT_R03 = "/tmp/wt_r03"


# --------------------------------------------------------------- worker ----

def worker_main(pools_path: str, salt_base: int) -> None:
    import hashlib

    import numpy as np

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from c_ofdm_tpu import ModemConfig, make_frame_spec
    from c_ofdm_tpu.models import streaming

    spec = make_frame_spec(ModemConfig(), dtype=jnp.complex64,
                           fft_backend="matmul")
    cfg = spec.cfg
    S = 4
    max_frames = cfg.rx_buf_size + 1

    def run(pool, k, salt):
        def body(i, carry):
            state, acc = carry
            state, out = streaming.process_buffer(spec, state, pool[i % S],
                                                  max_frames, "gated")
            acc = (acc + out.num_found.astype(jnp.uint32).sum()
                   + out.mac_bytes.astype(jnp.uint32).sum())
            return state, acc
        st0 = streaming.init_state(spec, channels=0)
        return jax.lax.fori_loop(0, k, body, (st0, salt))[1]

    f = jax.jit(run)
    with np.load(pools_path) as z:
        pools = [jnp.asarray(z[k]) for k in sorted(z.files)]

    hlo = f.lower(pools[0], 4, jnp.uint32(0)).as_text()
    fp = hashlib.sha256(hlo.encode()).hexdigest()[:16]

    salt = iter(range(salt_base, salt_base + (1 << 20)))

    def call(p, k):
        t0 = time.perf_counter()
        float(f(p, k, jnp.uint32(next(salt))))
        return time.perf_counter() - t0

    call(pools[0], 1)                       # the single compile
    print(f"READY {fp}", flush=True)

    for line in sys.stdin:
        parts = line.split()
        if not parts or parts[0] == "Q":
            break
        k = int(parts[1])
        best = min(call(p, k) for p in pools)
        print(f"RESULT {best:.6f}", flush=True)


# --------------------------------------------------------------- parent ----

class Worker:
    def __init__(self, name: str, tree: str, salt_base: int):
        self.name = name
        # PREPEND the tree: the stock PYTHONPATH carries the TPU plugin
        old = os.environ.get("PYTHONPATH", "")
        env = dict(os.environ,
                   PYTHONPATH=f"{tree}:{old}" if old else tree)
        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--salt-base", str(salt_base)],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, text=True, env=env, cwd="/tmp")
        self.fp = None

    def wait_ready(self):
        line = self.proc.stdout.readline().split()
        assert line and line[0] == "READY", line
        self.fp = line[1]

    def timed(self, k: int) -> float:
        self.proc.stdin.write(f"T {k}\n")
        self.proc.stdin.flush()
        out = self.proc.stdout.readline().split()
        assert out and out[0] == "RESULT", out
        return float(out[1])

    def quit(self):
        try:
            self.proc.stdin.write("Q\n")
            self.proc.stdin.flush()
        except BrokenPipeError:
            pass
        self.proc.wait(timeout=30)


def parent_main(rounds: int, k_lo: int, k_hi: int) -> None:
    import numpy as np

    if not os.path.isdir(WT_R03):
        sys.exit(f"r03 worktree missing: git worktree add {WT_R03} ae299f1")

    if not os.path.exists(POOLS_PATH):
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import bench
        from c_ofdm_tpu import ModemConfig, make_frame_spec
        spec = make_frame_spec(ModemConfig())
        arrs = {}
        for r in range(3):
            # _make_rings pins the CPU backend (data prep, not the bench)
            rings, n_frames = bench._make_rings(spec, 4, seed=r, fill=0.8)
            arrs[f"p{r}"] = np.stack([rings.real, rings.imag],
                                     axis=-1).astype(np.float32)
        np.savez(POOLS_PATH, **arrs)
        print(f"pools written (~{n_frames} frames in the last pool set; "
              f"3 seeds): {POOLS_PATH}", flush=True)

    t0 = time.perf_counter()
    a = Worker("r03 ", WT_R03, salt_base=1)
    b = Worker("HEAD", os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), salt_base=1 << 24)
    a.wait_ready()
    b.wait_ready()
    print(f"both compiled in {time.perf_counter()-t0:.0f}s  "
          f"hlo[r03]={a.fp}  hlo[HEAD]={b.fp}  "
          f"{'IDENTICAL GRAPHS' if a.fp == b.fp else 'graphs differ'}",
          flush=True)

    est = {a: [], b: []}
    for r in range(rounds):
        for w in (a, b):                    # interleaved: same window
            t_lo = w.timed(k_lo)
            t_hi = w.timed(k_hi)
            m = (t_hi - t_lo) / (k_hi - k_lo)
            est[w].append(m)
            print(f"round {r} {w.name}: t({k_lo})={t_lo*1e3:6.1f}ms "
                  f"t({k_hi})={t_hi*1e3:6.1f}ms -> {m*1e3:.4f} ms/step",
                  flush=True)
    a.quit()
    b.quit()

    for w in (a, b):
        e = est[w]
        print(f"{w.name}: best {min(e)*1e3:.4f} ms/step, "
              f"median {sorted(e)[len(e)//2]*1e3:.4f}, "
              f"spread {max(e)/min(e):.2f}x", flush=True)
    ratio = min(est[b]) / min(est[a])
    print(f"HEAD/r03 best-marginal ratio: {ratio:.3f} "
          f"({'HEAD slower' if ratio > 1.02 else 'HEAD faster' if ratio < 0.98 else 'parity'})",
          flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--worker", action="store_true")
    p.add_argument("--salt-base", type=int, default=1)
    p.add_argument("--rounds", type=int, default=6)
    p.add_argument("--k-lo", type=int, default=K_LO_DEFAULT)
    p.add_argument("--k-hi", type=int, default=K_HI_DEFAULT)
    args = p.parse_args()
    if args.worker:
        worker_main(POOLS_PATH, args.salt_base)
    else:
        parent_main(args.rounds, args.k_lo, args.k_hi)


if __name__ == "__main__":
    main()
