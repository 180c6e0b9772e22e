"""Test harness setup: run JAX on 8 virtual CPU devices.

Must set the XLA flags before jax initializes its backends, hence this
lives at the very top of conftest (pytest imports conftest before tests).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep test-time compiles deterministic and quiet.
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Opt-in line coverage (no coverage.py in this image): set
# NERFMESHES_LINECOV=<out.json> and see scripts/line_coverage.py.
if os.environ.get("NERFMESHES_LINECOV"):
    import sys as _sys

    _sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import line_coverage as _linecov

    _linecov.start(os.environ["NERFMESHES_LINECOV"])

import numpy as np
import pytest

import jax

# jax may be preloaded at interpreter startup (TPU-tunnel sitecustomize), in
# which case the env vars above were too late — force the platform through
# the config API before any backend initializes.
jax.config.update("jax_platforms", "cpu")

# CPU jnp.dot defaults to a low-precision path; parity tests need true fp32.
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute end-to-end runs (deselect with -m 'not slow')"
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
