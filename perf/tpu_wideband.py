"""Wideband-geometry TPU record (BASELINE config #3): 8k-FFT QAM64.

Round-2 verdict gap #2: the wideband geometries were correctness-tested on
CPU only (tests/test_configs.py) with no committed TPU evidence.  This script
produces both on the real chip:

  1. correctness smoke — synchronized loopback (noise + CFO + timing offset)
     at the 8k/QAM64 geometry, BER < 1e-3 on-device in complex64 with the
     production matmul-DFT backend;
  2. throughput — the same marginal-time method as bench.py (one executable,
     traced trip count, distinct inputs per step, forced readback) on the
     full TX+RX chain at B=64 frames/step (~1.8 Msamples/step, comparable
     device occupancy to the flagship's B=256 x 6016).

Reference geometry machinery being generalized: `OFDM/Frame.cpp:16-24`
(batched FFTW plans at config-derived sizes), `config/config.txt:1-32`.

Run on the TPU:  python perf/tpu_wideband.py
"""

import json
import sys

import os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import bench as _bench
WIDEBAND = _bench.WIDEBAND   # single source of truth (bench.py emits the
#                              driver-recorded wideband metric since round 4)


def main():
    from c_ofdm_tpu import ModemConfig, make_frame_spec
    from c_ofdm_tpu.channel.sim import ChannelParams, apply_channel
    from c_ofdm_tpu.models import rx as rxm, tx as txm
    import bench

    # Backend choice at 8k: a HOST-constant matmul-DFT basis is ~270 MB of
    # HLO (the relay rejects the upload, HTTP 413), so the matmul backend
    # builds its basis ON DEVICE past fft.DEVICE_BASIS_MIN_ELEMS (exact
    # int32 phase index + one cos/sin pass, hoisted out of the bench loop).
    # Both backends are measured below; the record keeps the faster.
    cfg = ModemConfig(**WIDEBAND)
    spec = make_frame_spec(cfg, dtype=jnp.complex64, fft_backend="matmul")
    print(f"wideband: fft={cfg.fft_size} QAM{1 << cfg.mod_type} "
          f"frame_len={cfg.frame_len} frame_bytes={cfg.frame_bytes}",
          flush=True)

    # 1. correctness smoke on the chip (tests/test_configs.py semantics)
    rng = np.random.default_rng(cfg.fft_size)
    payload = rng.integers(0, 256, cfg.frame_bytes, dtype=np.uint8)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        frame = txm.transmit(spec, jnp.asarray(payload))
        params = ChannelParams(snr_db=25.0, cfo=1e-5, timing_offset=701,
                               capture_len=cfg.frame_len + 4096,
                               amplitude=10.0)
        cap = np.asarray(apply_channel(params, jax.random.PRNGKey(0), frame))
    raw = jnp.asarray(np.stack([cap.real, cap.imag], -1).astype(np.float32))

    @jax.jit
    def smoke(r):
        c = r[..., 0] + 1j * r[..., 1]
        res, s = rxm.receive_capture(spec, c)
        return res.mac_bytes, s.frame_start, s.found

    got, fs, found = jax.tree.map(np.asarray, smoke(raw))
    assert bool(found), "wideband sync missed on TPU"
    ber = np.unpackbits(got ^ payload).mean()
    print(f"wideband smoke: sync at {int(fs)} (true 701), BER {ber:.2e}",
          flush=True)
    assert abs(int(fs) - 701) <= 1 and ber < 1e-3

    # 2. throughput record, same method/metric convention as bench.py;
    #    A/B both symbol-transform backends, keep the faster as the record
    results = {}
    for be in ("matmul", "xla", "ct"):   # ct = round-5 wideband winner
        results[be] = bench.bench_batch(
            B=64, k_lo=4, k_hi=60, reps=3, rounds=4, cfg=cfg,
            metric=f"ofdm_wideband_8k_qam64_{be}_samples_per_s",
            fft_backend=be)
        print(json.dumps(results[be]), flush=True)
    best = max(results.values(), key=lambda r: r["value"])
    best = dict(best, metric="ofdm_wideband_8k_qam64_samples_per_s")
    print(json.dumps(best), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
