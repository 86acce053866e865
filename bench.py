"""Benchmark: full TX+RX chain throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's compute-bound 25.0 Msamples/s on one x86 core
(BASELINE.md; LOG.txt mean 240.5 us per 6016-sample frame, full rx chain).

Modes:
  python bench.py               # batch path: B=256 single-frame captures/step
  python bench.py --streaming   # production path: 41-frame ring buffers
                                # through models.streaming.process_buffer
                                # (t2-gated sync, carry-over state threading)

The measured batch step matches the reference's per-frame work end-to-end:
payload bytes -> QAM map -> pilot scatter -> batched IFFT -> CP -> frame
assembly -> two-tone detect -> preamble matched-filter sync -> coarse pilot
CFO -> derotation -> per-symbol CP CFO -> common phase -> LS channel est ->
batched FFT + pilot equalization -> hard demap.  The streaming step is the
reference's real workload (`rx.cpp:94-237`): a 246 656-sample ring with
frames at arbitrary offsets, detection gated on the two-tone track, up to 41
frames demodulated per buffer, carry-over halo between buffers.

Measurement notes for this environment: the TPU sits behind a relay where
(a) every compiled executable costs minutes of remote compile, (b) repeated
identical dispatches are memoized, and (c) block_until_ready is unreliable.
So: ONE executable total — a device-side fori_loop whose trip count is a
*traced* argument — timed at two trip counts with distinct per-step inputs
(step i consumes pool[i mod K]), a FRESH salt scalar folded into every
dispatch (without it, measurement rounds reusing the same (pool, k) pairs
degenerate to memoized replies — observed as an impossible >fp32-peak
0.011 ms/buffer in round 4), forced host readback of a data-dependent
checksum, and the marginal time (t_hi - t_lo)/(k_hi - k_lo) reported.
Relay-window quality drifts minute-to-minute (shared tenancy), so several
measurement rounds run and the final estimate is (min t_hi - min t_lo)
across rounds — queue noise only ADDS latency, so endpoint minima are
noise-free and their difference is outlier-safe in both directions
(min-of-per-round-marginals was not: one queue hiccup on a t_lo call once
produced an impossible 21 Gs/s — above the measured op-mix bound — in
round 5); the per-round spread is printed as a window-quality indicator.
"""

import argparse
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compile cache: repeated driver runs of the same source reuse
# the serialized executable instead of paying the multi-minute relay compile
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

BASELINE_SAMPLES_PER_S = 25.0e6

# BASELINE config #3's largest geometry (8k-FFT QAM64) — shared with
# perf/tpu_wideband.py.  Backend/batch choices are measured per geometry:
# at 8k the two-stage Cooley-Tukey matmul backend ("ct", 8192 = 64x128,
# round-5 A/B: 0.86-0.89 ms vs 1.02-1.09 ms for the XLA FFT, interleaved
# same-window) beats XLA FFT, which in turn beats the flat matmul-DFT
# (250x the FLOPs at 4096 occupied bins); B=128 is the wideband throughput
# sweet spot (B=64 is latency-bound, B=256 regresses — PERF.md round 4).
WIDEBAND = dict(fft_size=8192, num_data_subc=4096, num_pilot_subc=32,
                cp_size=1024, num_symb=2, pr_sin_len=512, mod_type=6)


def build_runner(spec, K):
    from c_ofdm_tpu.models import rx as rxm
    from c_ofdm_tpu.models import tx as txm

    def step(payload):
        frames = txm.transmit(spec, payload)
        # batch-native RX: scalar sync under vmap, Pallas window extraction,
        # one fused demod over [B, sig] — 2.83x the fully-vmapped form in a
        # same-window A/B (perf/batch_ab.py: 0.333 vs 0.943 ms/step)
        res, s = rxm.receive_batch(spec, frames)
        return (res.mac_bytes.astype(jnp.uint32).sum()
                + s.found.sum().astype(jnp.uint32))

    def run(pool, k, salt):
        def body(i, acc):
            return acc + step(pool[i % K])
        return jax.lax.fori_loop(0, k, body, salt)

    return jax.jit(run)


def measure(f, pools, k_lo, k_hi, rounds):
    """f(pool, k, salt) -> scalar.  The ``salt`` scalar folds into the
    checksum and takes a FRESH value on every dispatch: the relay memoizes
    repeated identical dispatches, and without the salt the measurement
    rounds (which reuse the same (pool, k) pairs) degenerate to cached
    replies — observed as a physically impossible 0.011 ms/buffer
    (> fp32 peak) with an 8x round spread in round 4."""
    salt = iter(range(1, 1 << 30))

    def call(p, k):
        return float(f(p, k, jnp.uint32(next(salt))))

    t0 = time.perf_counter()
    call(pools[0], 1)   # the single compile
    print(f"compile: {time.perf_counter()-t0:.1f}s", file=sys.stderr,
          flush=True)

    def timed(k):
        best = float("inf")
        for p in pools:      # distinct data per rep; salt defeats memoization
            t0 = time.perf_counter()
            call(p, k)       # forced readback
            best = min(best, time.perf_counter() - t0)
        return best

    # several measurement rounds (same executable — cheap): the relay window
    # quality drifts minute-to-minute.  The final marginal is
    # (min t_hi - min t_lo) across ALL rounds — queue noise only ever ADDS
    # latency, so the minimum of each endpoint is its noise-free estimate,
    # and differencing the minima is outlier-safe in BOTH directions.
    # (min over per-round marginals is not: a round whose t_lo call hits a
    # queue hiccup reports a deflated marginal — observed as a
    # physically impossible 0.074 ms/step = 21 Gs/s > the 16.5 Gs/s op-mix
    # bound, round-5 find.)
    lows, highs, estimates = [], [], []
    for r in range(rounds):
        t_lo = timed(k_lo)
        t_hi = timed(k_hi)
        lows.append(t_lo)
        highs.append(t_hi)
        est = max((t_hi - t_lo) / (k_hi - k_lo), 1e-9)
        estimates.append(est)
        print(f"round {r}: t({k_lo})={t_lo*1e3:.1f}ms t({k_hi})={t_hi*1e3:.1f}ms "
              f"-> {est*1e3:.3f} ms/step", file=sys.stderr, flush=True)
    best = max((min(highs) - min(lows)) / (k_hi - k_lo), 1e-9)
    spread = max(estimates) / min(estimates)
    print(f"window quality: min-endpoint marginal {best*1e3:.3f} ms/step, "
          f"per-round spread {spread:.2f}x over {rounds} rounds",
          file=sys.stderr, flush=True)
    return best


def bench_batch(B=256, K=8, k_lo=4, k_hi=100, reps=4, rounds=5, cfg=None,
                metric=None, fft_backend="matmul"):
    from c_ofdm_tpu import ModemConfig, make_frame_spec

    spec = make_frame_spec(cfg or ModemConfig(), dtype=jnp.complex64,
                           fft_backend=fft_backend)
    f = build_runner(spec, K)
    rng = np.random.default_rng(B)
    pools = [jnp.asarray(rng.integers(0, 256, (K, B, spec.cfg.frame_bytes),
                                      dtype=np.uint8)) for _ in range(reps)]
    per_step = measure(f, pools, k_lo, k_hi, rounds)
    sps = B * spec.cfg.frame_len / per_step
    print(f"B={B}: {sps/1e6:.1f} Msamples/s ({per_step*1e3:.3f} ms/step)",
          file=sys.stderr, flush=True)
    return {
        "metric": metric or "ofdm_tx_rx_samples_per_s_per_chip",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / BASELINE_SAMPLES_PER_S, 3),
    }


def bench_wideband(rounds=3):
    """Wideband 8k-FFT QAM64 full TX+RX chain (BASELINE config #3's largest
    geometry) — same marginal-time method; see WIDEBAND for the
    backend/batch rationale."""
    from c_ofdm_tpu import ModemConfig
    return bench_batch(B=128, k_lo=4, k_hi=36, reps=3, rounds=rounds,
                       cfg=ModemConfig(**WIDEBAND),
                       metric="ofdm_wideband_samples_per_s_per_chip",
                       fft_backend="ct")


def _make_rings(spec, n_rings, seed, fill=0.8):
    """Realistic ingest buffers: frames at random offsets with noise gaps,
    CFO, boundary-straddling frames across consecutive buffers.

    Construction is data prep, not the benchmark — it runs pinned to the CPU
    backend (the relayed TPU rejects some host readbacks outside the measured
    executable, and polluting the device queue would skew timing anyway)."""
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        return _make_rings_cpu(spec, n_rings, seed, fill)


def _make_rings_cpu(spec, n_rings, seed, fill):
    from c_ofdm_tpu.mac.mac import Mac
    from c_ofdm_tpu.models import tx as txm

    cfg = spec.cfg
    buf_len = cfg.rx_buf_size * cfg.frame_len
    total = n_rings * buf_len
    mac = Mac(frame_bytes=cfg.frame_bytes, spread=cfg.mod_type)
    rng = np.random.default_rng(seed)
    n_frames = int(fill * total / cfg.frame_len)
    payloads = rng.integers(0, 256, (n_frames, mac.payload), dtype=np.uint8)
    wire = mac.write(jnp.asarray(payloads),
                     jnp.arange(n_frames, dtype=jnp.uint32))
    frames = np.asarray(txm.transmit(spec, wire))
    # random gaps summing to the slack
    slack = total - n_frames * cfg.frame_len
    gaps = rng.multinomial(slack, np.ones(n_frames + 1) / (n_frames + 1))
    sig = np.zeros(total, dtype=np.complex64)
    pos = 0
    for i in range(n_frames):
        pos += gaps[i]
        sig[pos:pos + cfg.frame_len] = frames[i]
        pos += cfg.frame_len
    n = np.arange(total)
    sig = sig * np.exp(2j * np.pi * 1e-4 * n) * 60.0
    noise = (rng.standard_normal(total) + 1j * rng.standard_normal(total))
    sig = sig + noise * np.sqrt((np.abs(frames) ** 2).mean() * 3600
                                * 10 ** (-26.0 / 10) / 2)
    return sig.reshape(n_rings, buf_len).astype(np.complex64), n_frames


def bench_streaming(S=4, k_lo=4, k_hi=160, reps=3, rounds=5,
                    sync_mode="gated", channels=1, metric=None,
                    rx_buf_size=40):
    """k_hi default 160 (round 4; was 60): at ~0.08 ms/buffer the 56-step
    differential was ~5 ms against a 25-30 ms dispatch RTT, so ±2 ms of
    relay queue jitter put ±40% on the marginal — the source of the
    single-channel metric's window swings (105x-196x across runs).  156
    steps give a ~12 ms differential; the multi-channel/batch/wideband
    metrics already sit at 18-36 ms and were stable."""
    from c_ofdm_tpu import ModemConfig, make_frame_spec
    from c_ofdm_tpu.models import streaming

    # rx_buf_size 40 = the reference's ring (apples-to-apples, the official
    # metric); larger rings amortize the per-buffer sync machinery and are
    # a legitimate operator choice on TPU (PERF.md round-5 row)
    spec = make_frame_spec(ModemConfig(rx_buf_size=rx_buf_size),
                           dtype=jnp.complex64, fft_backend="matmul")
    cfg = spec.cfg
    buf_len = cfg.rx_buf_size * cfg.frame_len
    max_frames = cfg.rx_buf_size + 1
    C = channels

    def run(pool, k, salt):
        # pool is interleaved f32 [S(, C), buf_len, 2] — the SDR wire format
        # (complex device_put is unimplemented on the relayed TPU runtime);
        # process_buffer forms complex on device.  channels > 1 exercises the
        # batch-first multi-channel state (BASELINE config #4+#5 combined).
        def body(i, carry):
            state, acc = carry
            state, out = streaming.process_buffer(spec, state, pool[i % S],
                                                  max_frames, sync_mode)
            acc = (acc + out.num_found.astype(jnp.uint32).sum()
                   + out.mac_bytes.astype(jnp.uint32).sum())
            return state, acc
        st0 = streaming.init_state(spec, channels=0 if C == 1 else C)
        return jax.lax.fori_loop(0, k, body, (st0, salt))[1]

    f = jax.jit(run)
    pools = []
    for r in range(reps):
        rings, n_frames = _make_rings(spec, S * C, seed=r)
        iq = np.stack([rings.real, rings.imag], axis=-1).astype(np.float32)
        if C > 1:
            # each channel gets a contiguous S-buffer time stream
            iq = iq.reshape(C, S, buf_len, 2).transpose(1, 0, 2, 3).copy()
        pools.append(jnp.asarray(iq))      # to the measured (TPU) device
    print(f"streaming: {S} steps x {C} channels x {buf_len} samples, "
          f"~{n_frames} frames", file=sys.stderr, flush=True)
    per_buf = measure(f, pools, k_lo, k_hi, rounds)
    sps = C * buf_len / per_buf
    fps = (n_frames / S) / per_buf
    print(f"streaming: {sps/1e6:.1f} Msamples/s sustained "
          f"({per_buf*1e3:.3f} ms/step, ~{fps:.0f} frames/s)",
          file=sys.stderr, flush=True)
    return {
        "metric": metric or "ofdm_streaming_samples_per_s_per_chip",
        "value": round(sps, 1),
        "unit": "samples/s",
        "vs_baseline": round(sps / BASELINE_SAMPLES_PER_S, 3),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--streaming", action="store_true",
                   help="bench ONLY the production streaming ring path")
    p.add_argument("--batch", action="store_true",
                   help="bench ONLY the batch path")
    p.add_argument("--wideband", action="store_true",
                   help="bench ONLY the wideband 8k-QAM64 geometry")
    p.add_argument("--sync-mode", choices=("gated", "dense"),
                   default="gated", help="streaming sync variant to A/B")
    p.add_argument("--channels", type=int, default=1,
                   help="independent channel streams per streaming step "
                        "(batch-first multi-channel state)")
    args = p.parse_args()
    if args.streaming:
        print(json.dumps(bench_streaming(sync_mode=args.sync_mode,
                                         channels=args.channels)))
        return
    if args.batch:
        print(json.dumps(bench_batch()))
        return
    if args.wideband:
        print(json.dumps(bench_wideband()))
        return
    # default (the driver command): every official metric, one JSON line
    # each, flagship batch number LAST (the driver parses the tail line).
    # Streaming = the reference's real workload (rx.cpp:94-237): 41-frame
    # rings, random frame offsets in noise+CFO, gated sync, carry threading.
    # Non-flagship metrics are best-effort: a failure there must never cost
    # the tail line.
    # rounds=5: the min-endpoint marginal only improves with more samples
    # of each endpoint (queue noise is one-sided), and a round costs ~0.2 s
    for extra in (lambda: bench_streaming(rounds=5),
                  lambda: bench_streaming(
                      channels=8, k_hi=30, rounds=5,
                      metric="ofdm_streaming_8ch_samples_per_s_per_chip"),
                  # 80-frame ingest rings: same chain, bigger buffers — the
                  # per-buffer sync machinery amortizes (round-5 A/B: 156x
                  # vs 100-104x for the reference's 41-frame ring in the
                  # same window; 160-frame rings regress to 137x).  The
                  # 41-frame metric above stays the apples-to-apples
                  # reference workload.
                  lambda: bench_streaming(
                      rx_buf_size=80, k_hi=80, rounds=5,
                      metric="ofdm_streaming_80frame_ring_samples_per_s_per_chip"),
                  bench_wideband):
        try:
            print(json.dumps(extra()), flush=True)
        except Exception as e:                      # noqa: BLE001
            print(f"non-flagship metric failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
    print(json.dumps(bench_batch()), flush=True)


if __name__ == "__main__":
    main()
