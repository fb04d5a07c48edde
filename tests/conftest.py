"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

This is the idiomatic TPU substitute for a fake cluster (SURVEY.md §4): all
data-parallel / sharded-embedding tests run on 8 virtual CPU devices so CI
needs no hardware; the driver separately dry-runs the multi-chip path.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# numerics tripwire (SURVEY.md §5.2): RECOMMEND_TPU_DEBUG_NANS=1 makes every
# test fail loudly at the first NaN-producing primitive
if os.environ.get("RECOMMEND_TPU_DEBUG_NANS"):
    jax.config.update("jax_debug_nans", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    ds = jax.devices()
    assert len(ds) == 8, ds
    return ds
