"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding paths are validated on virtual CPU devices (the driver
separately dry-runs them via __graft_entry__.dryrun_multichip).
"""

import os

# The base environment pins JAX_PLATFORMS=axon (TPU); the env var alone does
# not win, so force CPU via jax.config before any backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

REFERENCE_DIR = pathlib.Path("/root/reference")
UNITEST_FAST5_DIR = REFERENCE_DIR / "unitest" / "test_data" / "fast5"
TRAIN_FAST5_DIR = REFERENCE_DIR / "unitest" / "training_data" / "fast5"
MODEL_DIR = REFERENCE_DIR / "model"


@pytest.fixture(scope="session")
def unitest_fast5_files() -> list[pathlib.Path]:
    if not UNITEST_FAST5_DIR.is_dir():
        pytest.skip("reference unitest data not available")
    return sorted(p for p in UNITEST_FAST5_DIR.iterdir() if p.suffix == ".fast5")


@pytest.fixture(scope="session")
def train_fast5_files() -> list[pathlib.Path]:
    if not TRAIN_FAST5_DIR.is_dir():
        pytest.skip("reference training data not available")
    return sorted(p for p in TRAIN_FAST5_DIR.iterdir() if p.suffix == ".fast5")


@pytest.fixture(scope="session")
def ecoli_model_paths() -> tuple[pathlib.Path, pathlib.Path]:
    m1 = MODEL_DIR / "ecoli" / "ecoli_win13_50ep_model1.h5"
    m2 = MODEL_DIR / "ecoli" / "ecoli_win13_50ep_model2.h5"
    if not (m1.exists() and m2.exists()):
        pytest.skip("reference model weights not available")
    return m1, m2
