"""Test harness: force an 8-device CPU mesh (multi-chip sharding tests
run on virtual devices, per SURVEY.md §4)."""

import os

# The test suite runs on a virtual 8-device CPU mesh. The shell env pins
# JAX_PLATFORMS=axon (TPU tunnel), and jax is already imported by the
# time conftest runs (pytest plugins pull it in), so override via
# jax.config — the backend is initialized lazily, XLA_FLAGS is read then.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import jax.test_util  # noqa: E402,F401  (check_grads used across tests)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu", "tests must run on CPU"
assert jax.device_count() == 8, "tests need 8 virtual CPU devices"

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from f2nerf_tpu.core.config import Config, ModelConfig, TrainConfig  # noqa: E402


@pytest.fixture(scope="session")
def tiny_cfg() -> Config:
    """Small CPU-friendly config (paged hash, dense sampler)."""
    return Config(
        model=ModelConfig(
            n_levels=2, n_channels=2, log2_table_size=10, n_samples=32,
            sample_l=1.0 / 8.0, bf16_features=False,
            sampler_mode="dense", encode_chunk=65536),
        train=TrainConfig(
            pts_batch_size=16384, end_iter=40, report_freq=20,
            vis_freq=10 ** 9, save_freq=10 ** 9,
            learning_rate_warm_up_end_iter=10,
            var_loss_start=10, var_loss_end=20),
    )


@pytest.fixture(scope="session")
def occ_cfg(tiny_cfg) -> Config:
    return dataclasses.replace(
        tiny_cfg,
        model=dataclasses.replace(
            tiny_cfg.model, sampler_mode="occ", occ_grid_res=16,
            occ_segments=16, occ_keep=4, occ_samples_per_segment=2,
            occ_update_every=4),
    )


@pytest.fixture(scope="session")
def sphere_ds():
    from f2nerf_tpu.data.synthetic import make_sphere_dataset
    return make_sphere_dataset(n_images=4, h=24, w=24)


@pytest.fixture()
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
