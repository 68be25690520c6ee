"""Test configuration: force JAX onto an 8-device virtual CPU mesh.

Multi-chip sharding tests run against these virtual devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8); the real-TPU bench path
is exercised separately by bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# The environment's sitecustomize force-registers a TPU backend and pins
# jax_platforms="axon,cpu"; re-pin to cpu so tests run on the virtual mesh.
jax.config.update("jax_platforms", "cpu")

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE_ROOT = Path("/root/reference")


def has_reference() -> bool:
    return REFERENCE_ROOT.exists()


requires_reference = pytest.mark.skipif(
    not REFERENCE_ROOT.exists(), reason="reference implementation not available"
)


@pytest.fixture(scope="session")
def reference_modules():
    """Import the PyTorch reference (read-only) for golden-value comparisons."""
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference not available")
    sys.path.insert(0, str(REFERENCE_ROOT))
    import importlib

    mods = {}
    for name in ["models.model", "models.module", "models.dynamic_conv", "models.utils.warping"]:
        mods[name] = importlib.import_module(name)
    yield mods
    sys.path.remove(str(REFERENCE_ROOT))
