"""Test environment: CPU backend with 8 virtual devices (sharding tests run
without a pod) and x64 enabled (float64 golden-parity oracles)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers the 'axon' TPU plugin and
# overrides JAX_PLATFORMS; re-force CPU after import so tests run on the
# 8-device virtual CPU mesh regardless.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compile cache: the suite is compile-dominated on CPU
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REF = "/root/reference"


@pytest.fixture(scope="session")
def ref_capture():
    d = np.fromfile(f"{REF}/data/data.bin", dtype=np.float64)
    return d[::2] + 1j * d[1::2]


@pytest.fixture(scope="session")
def ref_source_int16():
    return np.fromfile(f"{REF}/data/source.bin", dtype=np.int16)


@pytest.fixture(scope="session")
def ref_constell():
    d = np.fromfile(f"{REF}/data/constell.bin", dtype=np.float64)
    return d[::2] + 1j * d[1::2]


@pytest.fixture(scope="session")
def ref_phases():
    d = np.fromfile(f"{REF}/data/phases.bin", dtype=np.float64)
    return d[::2] + 1j * d[1::2]


@pytest.fixture(scope="session")
def ref_t2_corr():
    return np.fromfile(f"{REF}/data/t2_sin_corr.bin", dtype=np.float64)


@pytest.fixture(scope="session")
def ref_decoded_text():
    with open(f"{REF}/data.txt", "rb") as f:
        return f.read()


@pytest.fixture(scope="session")
def cfg():
    from c_ofdm_tpu.config import ModemConfig
    return ModemConfig()


@pytest.fixture(scope="session")
def spec64(cfg):
    """complex64 spec — the TPU production dtype."""
    import jax.numpy as jnp
    from c_ofdm_tpu.models.frame import make_frame_spec
    return make_frame_spec(cfg, dtype=jnp.complex64)


@pytest.fixture(scope="session")
def spec128(cfg):
    """complex128 spec — golden-parity validation on CPU."""
    import jax.numpy as jnp
    from c_ofdm_tpu.models.frame import make_frame_spec
    return make_frame_spec(cfg, dtype=jnp.complex128)
