"""Test configuration: force an 8-device virtual CPU mesh.

Distributed tests run without a cluster via
XLA_FLAGS=--xla_force_host_platform_device_count=8 (SURVEY.md §4.3); the
single-device numerics tests run on the same CPU backend for speed and
determinism of the oracle comparisons.
"""

import os

# The harness presets JAX_PLATFORMS=axon (remote TPU); tests must run on the
# local CPU backend with 8 virtual devices.  The jaxtyping pytest plugin
# imports jax before this conftest, so the env var alone is too late —
# jax.config.update below still works because no backend is initialized yet.
_platform = os.environ.get("OF_DIS_TEST_PLATFORM", "cpu")
# Preserve the harness's platform for tests that deliberately run a
# subprocess on the real accelerator (tests/test_golden_fullres.py).
os.environ.setdefault("OF_DIS_HOST_PLATFORM", os.environ.get("JAX_PLATFORMS", ""))
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax
import numpy as np
import pytest

jax.config.update("jax_platforms", _platform)

# Persistent compilation cache: the pipeline jit is expensive to build; cache
# it across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/of_dis_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def smooth_pair():
    """A smooth random image pair with known integer translation (-3, +2)."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.RandomState(0)
    H, W = 96, 128
    base = gaussian_filter(rng.rand(H + 16, W + 16).astype(np.float32) * 255, 3.0) * 255
    img1 = base[8 : 8 + H, 8 : 8 + W].copy()
    img2 = base[6 : 6 + H, 11 : 11 + W].copy()  # img1(x,y) = img2(x-3, y+2)
    return img1, img2, (-3.0, 2.0)
