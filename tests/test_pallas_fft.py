"""Pallas batched DFT kernel vs jnp.fft (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from c_ofdm_tpu.ops.pallas_fft import dft_pallas


@pytest.mark.parametrize("n", [256, 512])
def test_pallas_dft_matches_fft(n):
    rng = np.random.default_rng(n)
    x = (rng.standard_normal((8, n)) + 1j * rng.standard_normal((8, n))
         ).astype(np.complex64)
    fwd = np.asarray(dft_pallas(jnp.asarray(x), sign=-1))
    ref = np.fft.fft(x)
    assert np.allclose(fwd, ref, atol=2e-2 * np.abs(ref).max())
    bwd = np.asarray(dft_pallas(jnp.asarray(x), sign=+1,
                                scale=1.0 / np.sqrt(n)))
    ref_b = np.fft.ifft(x) * n / np.sqrt(n)
    assert np.allclose(bwd, ref_b, atol=2e-2 * np.abs(ref_b).max())


def test_pallas_dft_leading_dims():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, 3, 256)) + 1j * rng.standard_normal((2, 3, 256))
         ).astype(np.complex64)
    y = np.asarray(dft_pallas(jnp.asarray(x)))
    ref = np.fft.fft(x)
    assert y.shape == x.shape
    assert np.allclose(y, ref, atol=2e-2 * np.abs(ref).max())


def test_pallas_backend_loopback(cfg):
    """Full TX->RX loopback with the pallas DFT backend (interpret on CPU)."""
    import jax.numpy as jnp
    from c_ofdm_tpu.models.frame import make_frame_spec
    from c_ofdm_tpu.models import rx as rxm, tx as txm

    spec = make_frame_spec(cfg, dtype=jnp.complex64, fft_backend="pallas")
    rng = np.random.default_rng(0)
    payload = rng.integers(0, 256, (2, cfg.frame_bytes), dtype=np.uint8)
    frames = txm.transmit(spec, jnp.asarray(payload))
    res = rxm.demod_frame(spec, frames)
    assert np.array_equal(np.asarray(res.mac_bytes), payload)
