"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on CPU (no multi-chip TPU hardware in this
environment); the driver separately dry-run-compiles the multi-chip path via
__graft_entry__.dryrun_multichip.
"""
import os

# The environment presets JAX_PLATFORMS=axon (real TPU tunnel); tests must
# run on a virtual 8-device CPU mesh, so force-assign (not setdefault).
# Set REPAS_TEST_TPU=1 to run the suite against the real chip instead.
if not os.environ.get("REPAS_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize hook may have pre-imported jax at interpreter
# startup and called jax.config.update("jax_platforms", "axon,cpu"),
# which overrides the env var above. Force the config back (backends are
# not initialized yet at conftest import, so this takes effect).
import sys  # noqa: E402

if "jax" in sys.modules and not os.environ.get("REPAS_TEST_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/repas_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import pathlib

import numpy as np
import pytest

REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_root():
    if not REFERENCE.exists():
        pytest.skip("reference captures not mounted")
    return REFERENCE


@pytest.fixture()
def rng():
    # function-scoped on purpose: a session-scoped generator makes every
    # test's random data depend on which tests ran before it (the whole
    # suite becomes order-dependent and single-test runs see different
    # data than full-suite runs)
    return np.random.default_rng(0)
