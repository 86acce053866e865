"""Speed-of-light lower bounds per executable (round-4 verdict task 2).

The roofline table (perf/roofline.py) reports achieved %-of-fp32-MXU-peak,
which left "~20% of peak" as a datum, not a ceiling: a DSP chain's FLOPs are
split between MXU matmuls, VPU elementwise work, and VPU transcendentals,
and only a per-component bound says whether 20% is the op-mix ceiling or
head-room.  This tool builds that bound:

  1. MEASURED VPU rates — one microbenchmark executable per op class
     (mul/fma baseline, sine, atan2, sqrt, rsqrt, exp), marginal-time
     method, saved to /tmp/sol_rates.json (they are chip constants).
  2. Per-stage op census from the COMPILED optimized HLO: dot FLOPs
     (2 * prod(out) * contracted) attributed to the MXU at 49.2 TF/s fp32,
     every transcendental kind counted by output-shape elements and charged
     at its measured VPU rate, remaining cost-analysis FLOPs charged at the
     measured VPU mul rate.
  3. HBM floor: entry inputs + outputs once at 819 GB/s (fusion keeps
     intermediates on-chip; this is a true floor).
  4. Dispatch floor: the measured per-step overhead of an empty fori_loop
     body through the same harness.

     bound_ms = max(t_mxu, t_vpu_total, t_hbm, t_dispatch)

  measured/bound ≈ 1 means the stage is AT its op-mix speed of light;
  large ratios mark real head-room (serialization, latency, poor tiling).

Usage (on the TPU):
  python perf/sol.py rates                 # measure + cache VPU rates
  python perf/sol.py full recover sync     # batch-path stages (B=256)
  python perf/sol.py sfull                 # streaming stage
  python perf/sol.py --no-measure full     # bound only (no timing runs)

Reference hot chain being bounded: `/root/reference/rx.cpp:201-220`,
`OFDM/Frame.cpp:73-96`.
"""

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

PEAK_F32_TFLOPS = 49.2          # v5e MXU fp32 (197 bf16 / 4)
PEAK_HBM_GBS = 819.0
RATES_PATH = "/tmp/sol_rates.json"

# HLO op -> microbench rate used to charge it (elements/s)
_TRANS_RATE_KEY = {
    "exponential": "exp", "expm1": "exp", "log": "exp", "log1p": "exp",
    "logistic": "exp", "power": "exp", "tanh": "exp", "tan": "sine",
    "sine": "sine", "cosine": "sine", "atan2": "atan2",
    "sqrt": "sqrt", "rsqrt": "rsqrt", "cbrt": "sqrt",
}


# ------------------------------------------------------------ VPU rates ----

def _rate_ops():
    tiny = np.float32(1e-7)
    return {
        "mul": (lambda x: x * np.float32(1.0000001) + tiny, 2),
        "sine": (jnp.sin, 1),
        "atan2": (lambda x: jnp.arctan2(x, x + np.float32(1.0)), 1),
        "sqrt": (lambda x: jnp.sqrt(jnp.abs(x) + tiny), 1),
        "rsqrt": (lambda x: jax.lax.rsqrt(jnp.abs(x) + tiny), 1),
        "exp": (lambda x: jnp.exp(-jnp.abs(x)), 1),
    }


def measure_rates(size=1 << 22, k_lo=4, k_hi=64, reps=3):
    """Per-op VPU throughput (elements/s) via the salted marginal method.
    The loop body is op(x + i*eps) accumulated elementwise — ~2 extra VPU
    flops per element, which inflate the charged rate of cheap ops (mul,
    sqrt) a little and are noise for the expensive ones; bounds built from
    these rates stay true lower bounds."""
    rng = np.random.default_rng(0)
    rates = {}
    for name, (op, _) in _rate_ops().items():
        def run(x, k, salt):
            def body(i, acc):
                return acc + op(x + i.astype(jnp.float32) * np.float32(1e-6))
            y = jax.lax.fori_loop(0, k, body,
                                  jnp.zeros_like(x) + salt.astype(jnp.float32))
            return y.sum()
        f = jax.jit(run)
        xs = [jnp.asarray(rng.standard_normal(size), dtype=jnp.float32)
              for _ in range(reps)]
        salt = iter(range(1, 1 << 20))

        def call(x, k):
            t0 = time.perf_counter()
            float(f(x, k, jnp.uint32(next(salt))))
            return time.perf_counter() - t0

        call(xs[0], 1)
        t_lo = min(call(x, k_lo) for x in xs)
        t_hi = min(call(x, k_hi) for x in xs)
        per = (t_hi - t_lo) / (k_hi - k_lo)
        rates[name] = size / per
        print(f"{name}: {size/per/1e9:.2f} Gelem/s ({per*1e3:.3f} ms / "
              f"{size>>20} Melem pass)", flush=True)
    with open(RATES_PATH, "w") as fh:
        json.dump(rates, fh)
    return rates


def load_rates():
    if os.path.exists(RATES_PATH):
        with open(RATES_PATH) as fh:
            return json.load(fh)
    return measure_rates()


# ------------------------------------------------------------ HLO census ----

_SHAPE_RE = re.compile(r"=\s+(?:\()?([a-z][a-z0-9]+)\[([\d,]*)\][^\s]*\s+"
                       r"([a-z][a-z0-9-]*)\(")
_DOT_LHS_RE = re.compile(r"\b(?:dot|dot-general)\(\s*[a-z][a-z0-9]+"
                         r"\[([\d,]*)\]")
_CONTRACT_RE = re.compile(r"lhs_contracting_dims=\{([\d,]*)\}")


def _elems(dim_str: str) -> int:
    if not dim_str:
        return 1
    return int(np.prod([int(d) for d in dim_str.split(",")]))


def census(hlo_text: str):
    """(dot_flops, {trans_op: elements}, n_instructions) from optimized HLO.
    Computations are counted once each — correct for straight-line stage
    executables (no while loops); the stage builders here are loop-free."""
    dot_flops = 0
    trans = {}
    n_instr = 0
    cplx = {"c64": 2, "c128": 2}
    for line in hlo_text.splitlines():
        m = _SHAPE_RE.search(line)
        if not m:
            continue
        dtype, dims, op = m.groups()
        n_instr += 1
        n = _elems(dims)
        if op in ("dot", "dot-general"):
            lhs = _DOT_LHS_RE.search(line)
            con = _CONTRACT_RE.search(line)
            if lhs and con and con.group(1):
                lhs_dims = [int(d) for d in lhs.group(1).split(",")]
                k = int(np.prod([lhs_dims[int(i)]
                                 for i in con.group(1).split(",")]))
            else:
                k = 1
            # complex dots would be 4x, but the chain lowers complex matmul
            # to real dot pairs already
            dot_flops += 2 * n * k
        elif op in _TRANS_RATE_KEY:
            trans[op] = trans.get(op, 0) + n * cplx.get(dtype, 1)
    return dot_flops, trans, n_instr


# ------------------------------------------------------------- stages ------

def build_stage(name):
    """(step_fn, example_input pools, samples_per_step) for a stage name.
    Batch-path names delegate to perf_variants.make_step (PV_BACKEND=matmul,
    the production backend); streaming names build reference-sized rings."""
    if name in ("sgate", "ssync", "sfull"):
        import bench as benchmod
        from c_ofdm_tpu import ModemConfig, make_frame_spec
        from c_ofdm_tpu.models import streaming
        from c_ofdm_tpu.ops import sync as syncops

        spec = make_frame_spec(ModemConfig(), dtype=jnp.complex64,
                               fft_backend="matmul")
        cfg = spec.cfg
        buf_len = cfg.rx_buf_size * cfg.frame_len
        max_frames = cfg.rx_buf_size + 1

        def to_ring(p):
            blk = p[..., 0] + 1j * p[..., 1]
            return jnp.concatenate(
                [jnp.zeros((cfg.frame_len,), blk.dtype), blk])

        def sgate(p):
            return syncops.t2_ratio_track_hop(spec, to_ring(p)).sum()

        def ssync(p):
            pos, val = streaming.gated_hits(spec, to_ring(p),
                                            jnp.asarray(0, jnp.int32),
                                            max_frames)
            return pos.sum().astype(jnp.float32) + val.sum()

        def sfull(p):
            st0 = streaming.init_state(spec)
            _, out = streaming.process_buffer(spec, st0, p, max_frames)
            return (out.num_found.astype(jnp.float32)
                    + out.mac_bytes.astype(jnp.float32).sum())

        pools = []
        for r in range(3):
            rings, _ = benchmod._make_rings(spec, 1, seed=r)
            pools.append(jnp.asarray(
                np.stack([rings[0].real, rings[0].imag], -1),
                dtype=jnp.float32))
        return {"sgate": sgate, "ssync": ssync, "sfull": sfull}[name], \
            pools, buf_len
    os.environ.setdefault("PV_BACKEND", "matmul")
    import perf_variants as pv
    step, spec = pv.make_step(name)
    rng = np.random.default_rng(1)
    pools = [jnp.asarray(rng.integers(0, 256, (pv.B, spec.cfg.frame_bytes),
                                      dtype=np.uint8)) for _ in range(3)]
    return step, pools, pv.B * spec.cfg.frame_len


def measure_step(step, pools, k_lo=4, k_hi=36):
    """Marginal ms/step of a fori_loop over the stage (salted dispatches)."""
    def run(pool, k, salt):
        return jax.lax.fori_loop(
            0, k,
            lambda i, acc: acc + step(pool).astype(jnp.float32),
            salt.astype(jnp.float32))
    f = jax.jit(run)
    salt = iter(range(1, 1 << 20))

    def call(p, k):
        t0 = time.perf_counter()
        float(f(p, k, jnp.uint32(next(salt))))
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    call(pools[0], 1)
    print(f"  compile {time.perf_counter()-t0:.0f}s", file=sys.stderr,
          flush=True)
    t_lo = min(call(p, k_lo) for p in pools)
    t_hi = min(call(p, k_hi) for p in pools)
    return (t_hi - t_lo) / (k_hi - k_lo)


def dispatch_floor(pools, k_lo=4, k_hi=36):
    """Per-step overhead of an EMPTY loop body through the same harness."""
    def run(pool, k, salt):
        return jax.lax.fori_loop(
            0, k, lambda i, acc: acc + pool.ravel()[i].astype(jnp.float32),
            salt.astype(jnp.float32))
    f = jax.jit(run)
    salt = iter(range(1 << 10, 1 << 20))

    def call(p, k):
        t0 = time.perf_counter()
        float(f(p, k, jnp.uint32(next(salt))))
        return time.perf_counter() - t0
    call(pools[0], 1)
    t_lo = min(call(p, k_lo) for p in pools)
    t_hi = min(call(p, k_hi) for p in pools)
    return (t_hi - t_lo) / (k_hi - k_lo)


def bound_stage(name, rates, measure=True):
    step, pools, samples = build_stage(name)
    lowered = jax.jit(step).lower(pools[0])
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    flops = ca.get("flops", 0.0)
    dot_flops, trans, n_instr = census(compiled.as_text())
    vpu_flops = max(flops - dot_flops, 0.0)

    t_mxu = dot_flops / (PEAK_F32_TFLOPS * 1e12)
    t_trans = sum(cnt / rates[_TRANS_RATE_KEY[op]]
                  for op, cnt in trans.items())
    t_vpu = vpu_flops / rates["mul"] / 2 + t_trans   # mul bench: 2 flop/elem
    in_bytes = pools[0].size * pools[0].dtype.itemsize
    out_bytes = 4                          # scalar checksum readback
    t_hbm = (in_bytes + out_bytes) / (PEAK_HBM_GBS * 1e9)

    row = {
        "stage": name,
        "dot_gflop": round(dot_flops / 1e9, 3),
        "vpu_gflop": round(vpu_flops / 1e9, 3),
        "mtrans": {k: round(v / 1e6, 3) for k, v in sorted(trans.items())},
        "t_mxu_ms": round(t_mxu * 1e3, 4),
        "t_vpu_ms": round(t_vpu * 1e3, 4),
        "t_trans_ms": round(t_trans * 1e3, 4),
        "t_hbm_ms": round(t_hbm * 1e3, 4),
    }
    if measure:
        per = measure_step(step, pools)
        t_disp = dispatch_floor(pools)
        bound = max(t_mxu, t_vpu, t_hbm, t_disp)
        row.update({
            "t_dispatch_ms": round(t_disp * 1e3, 4),
            "bound_ms": round(bound * 1e3, 4),
            "measured_ms": round(per * 1e3, 4),
            "measured_over_bound": round(per / bound, 2),
            "gsamples_per_s": round(samples / per / 1e9, 2),
        })
    print(json.dumps(row), flush=True)
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("stages", nargs="+",
                   help="'rates' and/or stage names (full recover sync tx "
                        "odemod demap sfull ssync sgate ...)")
    p.add_argument("--no-measure", action="store_true",
                   help="print bound components only (no timing runs)")
    args = p.parse_args()
    names = list(args.stages)
    if "rates" in names:
        names.remove("rates")
        rates = measure_rates()
    else:
        rates = load_rates()
    print(f"rates (Gelem/s): "
          f"{ {k: round(v/1e9, 2) for k, v in rates.items()} }",
          file=sys.stderr, flush=True)
    for name in names:
        bound_stage(name, rates, measure=not args.no_measure)


if __name__ == "__main__":
    main()
