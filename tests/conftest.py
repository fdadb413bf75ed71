"""Test configuration: force CPU JAX with a virtual 8-device mesh so sharding
tests run anywhere (SURVEY §4 implication (e))."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# The environment may pre-register a TPU plugin at interpreter start (before
# conftest runs), so overriding JAX_PLATFORMS via env is not enough — update
# the live config instead.
os.environ["JAX_PLATFORMS"] = "cpu"
# No persistent compilation cache under tests: the cache dir is shared with
# the TPU relay, whose host compiles XLA:CPU AOT entries with different
# machine features (loading them here risks SIGILL; observed as a
# cpu_aot_loader warning). The cache's payoff is TPU sweep compiles only.
os.environ["ET_JAX_CACHE_DIR"] = "off"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def make_scene(rng, n_ped=6, obs_len=8, pred_len=12, speed=1.0):
    """Synthetic scene: smooth random-walk trajectories."""
    start = rng.normal(size=(n_ped, 1, 2)) * 5
    vel = rng.normal(size=(n_ped, 1, 2)) * speed
    t = np.arange(obs_len + pred_len)[None, :, None]
    wiggle = 0.05 * np.cumsum(rng.normal(size=(n_ped, obs_len + pred_len, 2)), axis=1)
    traj = start + vel * t + wiggle
    return traj[:, :obs_len].astype(np.float32), traj[:, obs_len:].astype(np.float32)


@pytest.fixture
def scene(rng):
    return make_scene(rng)
