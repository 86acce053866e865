"""Dump compiled-HLO op histograms for full vs static receive compositions."""
import sys
import collections
import re
import numpy as np
import jax
import jax.numpy as jnp

from c_ofdm_tpu import ModemConfig, make_frame_spec
from c_ofdm_tpu.models import rx as rxm, tx as txm

B = 256
spec = make_frame_spec(ModemConfig(), dtype=jnp.complex64, fft_backend="matmul")
mode = sys.argv[1]


def step(payload):
    frames = txm.transmit(spec, payload)
    s = jax.vmap(lambda c: rxm.synchronize(spec, c))(frames)
    if mode == "static":
        sigs = frames[..., spec.cfg.t2sin_size:]
    else:
        sigs = jax.vmap(lambda c, st: rxm.extract_sig(spec, c, st))(
            frames, s.frame_start)
    res = rxm.demod_sig(spec, sigs)
    return res.mac_bytes.astype(jnp.uint32).sum() + s.found.sum().astype(jnp.uint32)


payload = jnp.zeros((B, spec.cfg.frame_bytes), dtype=jnp.uint8)
lowered = jax.jit(step).lower(payload)
comp = lowered.compile()
txt = comp.as_text()
with open(f"/tmp/hlo_{mode}.txt", "w") as f:
    f.write(txt)
hist = collections.Counter()
for line in txt.splitlines():
    m = re.search(r"= \S+ (\w+)\(", line)
    if m:
        hist[m.group(1)] += 1
print(mode, "op histogram (top 25):")
for k, v in hist.most_common(25):
    print(f"  {k:24s} {v}")
ca = comp.cost_analysis()
if ca:
    ca = ca[0] if isinstance(ca, list) else ca
    for key in ("flops", "bytes accessed", "transcendentals"):
        if key in ca:
            print(f"{mode} {key}: {ca[key]:.3e}")
