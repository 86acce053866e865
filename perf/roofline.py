"""Roofline accounting (round-2 verdict weak #5): per-stage FLOPs and HBM
bytes from XLA's own cost analysis of the compiled TPU executables, combined
with measured step times into achieved TFLOP/s / GB/s vs chip peaks.

Peaks used (TPU v5e public specs): 197 TFLOP/s bf16 MXU, ~49 TFLOP/s fp32
(1/4 rate), 819 GB/s HBM.  The chain runs fp32-dominant (complex64 as real
pairs through 4-matmul complex products), so fp32 is the MXU peak that
applies; stages that are neither near the fp32 MXU peak nor near HBM
bandwidth are VPU/latency-bound (transcendentals, byte twiddling, small
shapes) — called out per stage.

Usage (on the TPU; executables come from the persistent compile cache so
this costs seconds after perf_variants/bench have run):

  python perf/roofline.py                      # batch-path stages
  python perf/roofline.py --times t.json       # + measured ms/step ->
                                               #   achieved TFLOP/s, GB/s

`--times` is a JSON object {variant: ms_per_step} from perf_variants runs.

NOTE (round 5): bare-stage (loop-free) TPU compiles now crash the relay's
compile helper (signal 4), so this tool's on-TPU cost-analysis path may
fail; `perf/sol.py` supersedes it — CPU-compiled op census + jaxpr dot
FLOPs + measured VPU rates -> per-stage speed-of-light bounds.
"""

import argparse
import json
import sys

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

PEAK_F32_TFLOPS = 49.2       # v5e MXU fp32 (197 bf16 / 4)
PEAK_HBM_GBS = 819.0


def batch_cost(name, B=256):
    """Cost analysis of one perf_variants batch stage (single step, no
    fori_loop wrapper — the loop body is what repeats)."""
    import perf_variants as pv
    pv.B = B
    step, spec = pv.make_step(name)
    x = jnp.zeros((B, spec.cfg.frame_bytes), dtype=jnp.uint8)
    c = jax.jit(step).lower(x).compile()
    return c.cost_analysis(), spec


def stream_cost(which):
    """Cost analysis of one streaming stage on a reference-sized ring."""
    from c_ofdm_tpu import ModemConfig, make_frame_spec
    from c_ofdm_tpu.models import streaming

    spec = make_frame_spec(ModemConfig(), dtype=jnp.complex64,
                           fft_backend="matmul")
    cfg = spec.cfg
    buf_len = cfg.rx_buf_size * cfg.frame_len
    max_frames = cfg.rx_buf_size + 1

    def sfull(p):
        st0 = streaming.init_state(spec)
        _, out = streaming.process_buffer(spec, st0, p, max_frames)
        return (out.num_found.astype(jnp.float32)
                + out.mac_bytes.astype(jnp.float32).sum())

    from c_ofdm_tpu.ops import sync as syncops

    def to_ring(p):
        blk = p[..., 0] + 1j * p[..., 1]
        return jnp.concatenate([jnp.zeros((cfg.frame_len,), blk.dtype), blk])

    def sgate(p):
        return syncops.t2_ratio_track_hop(spec, to_ring(p)).sum()

    def ssync(p):
        pos, val = streaming.gated_hits(spec, to_ring(p),
                                        jnp.asarray(0, jnp.int32), max_frames)
        return pos.sum().astype(jnp.float32) + val.sum()

    fn = {"sfull": sfull, "sgate": sgate, "ssync": ssync}[which]
    x = jnp.zeros((buf_len, 2), dtype=jnp.float32)
    c = jax.jit(fn).lower(x).compile()
    return c.cost_analysis(), spec


def _row(name, ca, ms=None, per_what=1):
    flops = ca.get("flops", 0.0)
    bytes_ = ca.get("bytes accessed", 0.0)
    trans = ca.get("transcendentals", 0.0)
    out = {"stage": name, "gflop": round(flops / 1e9, 3),
           "mb_accessed": round(bytes_ / 1e6, 1),
           "mtranscendentals": round(trans / 1e6, 2)}
    if ms:
        t = ms * 1e-3
        out["ms"] = ms
        out["tflops"] = round(flops / t / 1e12, 2)
        out["pct_f32_peak"] = round(100 * flops / t / 1e12 / PEAK_F32_TFLOPS, 1)
        out["gbs"] = round(bytes_ / t / 1e9, 1)
        out["pct_hbm_peak"] = round(100 * bytes_ / t / 1e9 / PEAK_HBM_GBS, 1)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--times", default="", help="JSON {variant: ms_per_step}")
    p.add_argument("--variants", default="tx,sync,extract,recover,odemod,"
                   "demap,full,sgate,ssync,sfull")
    args = p.parse_args()
    times = json.loads(open(args.times).read()) if args.times else {}

    rows = []
    for name in args.variants.split(","):
        name = name.strip()
        try:
            ca, _ = (stream_cost(name) if name.startswith("s")
                     and name in ("sgate", "ssync", "sfull")
                     else batch_cost(name))
        except Exception as e:
            print(f"{name}: SKIP ({type(e).__name__}: {e})", file=sys.stderr)
            continue
        rows.append(_row(name, ca, times.get(name)))
        print(json.dumps(rows[-1]), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
