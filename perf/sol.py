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

# MXU rate charged to f32 dots.  NOT the naive "fp32 = bf16/4" 49.2 TF/s:
# this environment compiles with --xla_allow_excess_precision=true and XLA
# lowers f32 dots through the 3-pass bf16x3 decomposition (~197/3 TF/s).
# Empirical proof: the odemod stage MEASURED 0.71x the 49.2-TF/s bound —
# physically impossible for a true lower bound — and 0.95x of this one.
PEAK_F32_TFLOPS = 197.0 / 3
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

_CHAIN = 64                     # dependent ops per element per iteration


def _rate_ops():
    tiny = np.float32(1e-7)
    one = np.float32(1.0000001)
    return {
        "mul": lambda y: y * one + tiny,
        "sine": lambda y: jnp.sin(y) + one,
        "atan2": lambda y: jnp.arctan2(y, jnp.abs(y) + one),
        "sqrt": lambda y: jnp.sqrt(jnp.abs(y) + one),
        "rsqrt": lambda y: jax.lax.rsqrt(jnp.abs(y) + one),
        "exp": lambda y: jnp.exp(-jnp.abs(y) - tiny),
    }


def measure_rates(size=1 << 22, reps=3):
    """Per-op VPU throughput (elements/s) via the salted marginal method.

    Each loop iteration applies a CHAIN of 64 dependent copies of the op per
    element, so per-iteration time is compute-dominated (the body's +-abs
    glue and the loop's HBM traffic are amortized 64x).  The glue makes the
    measured rate slightly PESSIMISTIC per op, and chaining hides no cost —
    bounds built from these rates can only be conservative in the safe
    direction (an overestimated rate would underestimate the bound; glue
    cannot overestimate a rate).  Trip counts self-calibrate so the k_hi-k_lo
    differential is ~25-50 ms against the 25-30 ms relay dispatch RTT."""
    rng = np.random.default_rng(0)
    rates = {}
    for name, op in _rate_ops().items():
        def run(x, k, salt):
            def body(i, y):
                y = y + i.astype(jnp.float32) * np.float32(1e-6)
                for _ in range(_CHAIN):
                    y = op(y)
                return y
            y = jax.lax.fori_loop(0, k, body,
                                  x + salt.astype(jnp.float32) * np.float32(1e-6))
            return y.sum()
        f = jax.jit(run)
        xs = [jnp.asarray(rng.standard_normal(size) * 0.1, dtype=jnp.float32)
              for _ in range(reps)]
        salt = iter(range(1, 1 << 20))

        def call(x, k):
            t0 = time.perf_counter()
            float(f(x, k, jnp.uint32(next(salt))))
            return time.perf_counter() - t0

        call(xs[0], 1)
        # calibrate trip counts for a ~25-50 ms differential
        t_probe = (min(call(x, 36) for x in xs)
                   - min(call(x, 4) for x in xs)) / 32
        k_hi = 4 + max(32, min(4096, int(0.030 / max(t_probe, 1e-7))))
        t_lo = min(call(x, 4) for x in xs)
        t_hi = min(call(x, k_hi) for x in xs)
        per = (t_hi - t_lo) / (k_hi - 4)
        rates[name] = size * _CHAIN / per
        print(f"{name}: {rates[name]/1e9:.1f} Gelem/s "
              f"({per*1e3:.3f} ms/iter, k_hi={k_hi})", flush=True)
    with open(RATES_PATH, "w") as fh:
        json.dump(rates, fh)
    return rates


def load_rates():
    if os.path.exists(RATES_PATH):
        with open(RATES_PATH) as fh:
            return json.load(fh)
    # the rates are CHIP constants: refuse to silently measure them on a
    # CPU-forced census run and bake orders-of-magnitude-wrong bounds into
    # the saved census (review find, round 5)
    if jax.devices()[0].platform == "cpu":
        sys.exit(f"no cached VPU rates at {RATES_PATH} and the active "
                 "backend is CPU — run `python perf/sol.py rates` on the "
                 "TPU first")
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


def jaxpr_dot_flops(fn, *args) -> float:
    """Exact dot/conv FLOPs by walking the jaxpr (backend-independent —
    the CPU backend hides dots inside oneDNN custom-calls where the HLO
    census cannot see them).  Complex MACs count 8 real flops."""
    closed = jax.make_jaxpr(fn)(*args)

    def walk(jaxpr, mult=1.0):
        total = 0.0
        for eqn in jaxpr.eqns:
            if eqn.primitive.name in ("dot_general",):
                (lc, _), _ = eqn.params["dimension_numbers"]
                lhs = eqn.invars[0].aval
                out = eqn.outvars[0].aval
                k = int(np.prod([lhs.shape[i] for i in lc])) if lc else 1
                per_mac = 8 if jnp.issubdtype(out.dtype, jnp.complexfloating) \
                    else 2
                total += mult * per_mac * int(np.prod(out.shape)) * k
            for name, val in eqn.params.items():
                sub = getattr(val, "jaxpr", None)
                if sub is not None:
                    m = mult
                    if eqn.primitive.name == "scan":
                        m = mult * eqn.params.get("length", 1)
                    total += walk(sub, m)
        return total

    return walk(closed.jaxpr)


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
            if op == "exponential" and dtype in cplx:
                # a complex exponential is a sincos pair on the TPU VPU
                # (XLA's complex expander usually splits it before this
                # point; this handles HLO where it survived intact)
                trans["sine"] = trans.get("sine", 0) + 2 * n
            else:
                trans[op] = trans.get(op, 0) + n * cplx.get(dtype, 1)
    return dot_flops, trans, n_instr


# ------------------------------------------------------------- stages ------

def build_stage(name):
    """(step_fn, example_input pools, samples_per_step) for a stage name.
    Batch-path names delegate to perf_variants.make_step (PV_BACKEND=matmul,
    the production backend); streaming names build reference-sized rings."""
    if name in ("sgate", "ssync", "sfull"):
        import bench as benchmod
        import perf_variants as pv
        from c_ofdm_tpu import ModemConfig, make_frame_spec

        spec = make_frame_spec(ModemConfig(), dtype=jnp.complex64,
                               fft_backend="matmul")
        cfg = spec.cfg
        buf_len = cfg.rx_buf_size * cfg.frame_len
        max_frames = cfg.rx_buf_size + 1
        # shared builders (perf_variants.stream_stage_fns) so this census
        # and the perf_variants stage of the same name are the SAME graph
        fns = pv.stream_stage_fns(spec, max_frames)

        pools = []
        for r in range(3):
            rings, _ = benchmod._make_rings(spec, 1, seed=r)
            pools.append(jnp.asarray(
                np.stack([rings[0].real, rings[0].imag], -1),
                dtype=jnp.float32))
        return fns[name], pools, buf_len
    os.environ.setdefault("PV_BACKEND", "matmul")
    import perf_variants as pv
    step, spec = pv.make_step(name)
    rng = np.random.default_rng(1)
    pools = [jnp.asarray(rng.integers(0, 256, (pv.B, spec.cfg.frame_bytes),
                                      dtype=np.uint8)) for _ in range(3)]
    return step, pools, pv.B * spec.cfg.frame_len


def measure_step(step, pools, k_lo=4, k_hi=None):
    """Marginal ms/step of a fori_loop over the stage (salted dispatches).
    The body consumes pool[i % K] — a loop-VARIANT input — or XLA's
    loop-invariant code motion hoists the whole stage out of the loop and
    the marginal measures nothing (observed: 'measured' 3x below the MXU
    bound).  SOL_KHI >= 300 for sub-50 us stages (probe-noise rule)."""
    k_hi = k_hi or int(os.environ.get("SOL_KHI", 36))
    K = len(pools)
    stacked = jnp.stack(pools)

    def run(pool, k, salt):
        return jax.lax.fori_loop(
            0, k,
            lambda i, acc: acc + step(pool[i % K]).astype(jnp.float32),
            salt.astype(jnp.float32))
    f = jax.jit(run)
    salt = iter(range(1, 1 << 20))
    variants = [stacked, jnp.stack([p[::-1] for p in pools]),
                jnp.stack([jnp.roll(p, 1, axis=0) for p in pools])]

    def call(p, k):
        t0 = time.perf_counter()
        float(f(p, k, jnp.uint32(next(salt))))
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    call(variants[0], 1)
    print(f"  compile {time.perf_counter()-t0:.0f}s", file=sys.stderr,
          flush=True)
    t_lo = min(call(p, k_lo) for p in variants)
    t_hi = min(call(p, k_hi) for p in variants)
    return (t_hi - t_lo) / (k_hi - k_lo)


def dispatch_floor(pools, k_lo=64, k_hi=2048):
    """Per-step overhead of a trivial loop body (one dynamic u8 gather)
    through the same harness.  High trip counts: the body costs ~ us, so a
    36-step differential would be jitter-dominated against the 25-30 ms
    dispatch RTT."""
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


CENSUS_PATH = "/tmp/sol_census.json"


def census_stage(name, rates):
    """Op census + bound components from the CPU-compiled optimized HLO.

    Compiling a bare (loop-free) stage crashes the relayed TPU client
    (signal 4 in compile — round-5 find), so the census compiles for CPU:
    dot shapes and algebraically-simplified op counts are backend-stable.
    Two TPU-vs-CPU lowering differences are corrected for:
      * complex `exponential` stays one HLO op on CPU but is a sine+cosine
        pair on the TPU VPU — charged as 2 sine-rate elements;
      * the Pallas window-extract kernel is replaced by the XLA gather path
        on CPU — both are ~0-FLOP data movement, bound unaffected.
    """
    step, pools, samples = build_stage(name)
    compiled = jax.jit(step, backend="cpu").lower(pools[0]).compile()
    ca = compiled.cost_analysis()
    flops = float(ca.get("flops", 0.0)) if ca else 0.0
    hlo_dot_flops, trans, n_instr = census(compiled.as_text())
    # dots from the jaxpr: the CPU backend hides most dots inside oneDNN
    # custom-calls, invisible to both the HLO census and (sometimes) the
    # cost analysis
    dot_flops = max(jaxpr_dot_flops(step, pools[0]), hlo_dot_flops)
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
        "samples": samples,
        "dot_gflop": round(dot_flops / 1e9, 3),
        "vpu_gflop": round(vpu_flops / 1e9, 3),
        "mtrans": {k: round(v / 1e6, 3) for k, v in sorted(trans.items())},
        "t_mxu_ms": round(t_mxu * 1e3, 4),
        "t_vpu_ms": round(t_vpu * 1e3, 4),
        "t_trans_ms": round(t_trans * 1e3, 4),
        "t_hbm_ms": round(t_hbm * 1e3, 4),
    }
    saved = {}
    if os.path.exists(CENSUS_PATH):
        with open(CENSUS_PATH) as fh:
            saved = json.load(fh)
    saved[name] = row
    with open(CENSUS_PATH, "w") as fh:
        json.dump(saved, fh)
    print(json.dumps(row), flush=True)
    return row


def measure_stage(name, row):
    """Marginal TPU timing for a censused stage; prints the merged
    measured-vs-bound row."""
    step, pools, samples = build_stage(name)
    per = measure_step(step, pools)
    t_disp = dispatch_floor(pools)
    bound = max(row["t_mxu_ms"], row["t_vpu_ms"], row["t_hbm_ms"],
                t_disp * 1e3) * 1e-3
    row = dict(row)
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
    p.add_argument("--census-only", action="store_true",
                   help="run under JAX_PLATFORMS=cpu: compile + census only, "
                        "saved to " + CENSUS_PATH)
    p.add_argument("--measure-only", action="store_true",
                   help="on the TPU: time the stages, merge with the saved "
                        "census")
    args = p.parse_args()
    if args.census_only:
        # the environment's sitecustomize force-registers the TPU plugin and
        # overrides JAX_PLATFORMS; re-force CPU so the census compiles (and
        # the Pallas extract auto-detection picks its CPU fallback)
        jax.config.update("jax_platforms", "cpu")
    names = list(args.stages)
    if "rates" in names:
        names.remove("rates")
        rates = measure_rates()
    else:
        rates = load_rates()
    print(f"rates (Gelem/s): "
          f"{ {k: round(v/1e9, 2) for k, v in rates.items()} }",
          file=sys.stderr, flush=True)
    if args.measure_only:
        with open(CENSUS_PATH) as fh:
            saved = json.load(fh)
        for name in names:
            try:
                measure_stage(name, saved[name])
            except Exception as e:  # noqa: BLE001 — relay compile-helper
                # crashes (HTTP 500 SIGILL) are sporadic and per-graph;
                # lose one stage, not the run
                print(f"{name}: MEASURE FAILED ({type(e).__name__})",
                      flush=True)
        return
    for name in names:
        row = census_stage(name, rates)
        if not args.census_only:
            measure_stage(name, row)


if __name__ == "__main__":
    main()
