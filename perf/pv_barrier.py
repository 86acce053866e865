"""A/B: receive_batch with an optimization_barrier after the frame gather."""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

from c_ofdm_tpu import ModemConfig, make_frame_spec
from c_ofdm_tpu.models import rx as rxm, tx as txm

B, K, K_LO, K_HI, REPS = 256, 8, 4, 36, 3
spec = make_frame_spec(ModemConfig(), dtype=jnp.complex64, fft_backend="matmul")
mode = sys.argv[1]


def step(payload):
    frames = txm.transmit(spec, payload)
    s = jax.vmap(lambda c: rxm.synchronize(spec, c))(frames)
    sigs = jax.vmap(lambda c, st: rxm.extract_sig(spec, c, st))(
        frames, s.frame_start)
    if mode == "barrier":
        sigs = jax.lax.optimization_barrier(sigs)
    elif mode == "static":
        sigs = frames[..., spec.cfg.t2sin_size:]
    if mode == "recover":
        from c_ofdm_tpu.ops import cfo
        sig2, shift = cfo.recover_fused(spec, sigs)
        return (jnp.abs(sig2).sum() + shift.sum()).astype(jnp.uint32) + \
            s.found.sum().astype(jnp.uint32)
    if mode == "dft":
        from c_ofdm_tpu.ops import chanest, modulation
        cfg = spec.cfg
        nsym_all = cfg.num_pr_symb + cfg.num_symb
        syms = sigs.reshape(*sigs.shape[:-1], nsym_all,
                            cfg.ofdm_len)[..., cfg.cp_size:]
        pil, data = chanest.bins_transform(spec, syms)
        P = cfg.num_pr_symb
        pre_pts = chanest.pilot_equalize(spec, pil[..., :P, :], data[..., :P, :])
        const = chanest.pilot_equalize(spec, pil[..., P:, :], data[..., P:, :])
        chan = chanest.chan_est_lq(spec, pre_points=pre_pts)
        const = chanest.equalize(spec, const, chan)
        mb = modulation.demap_bytes(const, cfg.mod_type)
        return mb.astype(jnp.uint32).sum() + s.found.sum().astype(jnp.uint32)
    res = rxm.demod_sig(spec, sigs)
    return res.mac_bytes.astype(jnp.uint32).sum() + s.found.sum().astype(jnp.uint32)


def run(pool, k):
    return jax.lax.fori_loop(0, k, lambda i, a: a + step(pool[i % K]),
                             jnp.uint32(0))

f = jax.jit(run)
rng = np.random.default_rng(1)
pools = [jnp.asarray(rng.integers(0, 256, (K, B, spec.cfg.frame_bytes),
                                  dtype=np.uint8)) for _ in range(REPS)]
t0 = time.perf_counter()
float(f(pools[0], 1))
print(f"{mode}: compile {time.perf_counter()-t0:.0f}s", flush=True)

def timed(k):
    best = float("inf")
    for p in pools:
        t0 = time.perf_counter()
        float(f(p, k))
        best = min(best, time.perf_counter() - t0)
    return best

t_lo, t_hi = timed(K_LO), timed(K_HI)
per = (t_hi - t_lo) / (K_HI - K_LO)
print(f"{mode}: per-step {per*1e3:.3f} ms "
      f"({B*spec.cfg.frame_len/per/1e6:.0f} Msamples/s)", flush=True)
