"""Test harness config: force JAX onto a simulated 8-device CPU mesh.

SURVEY.md §4.2: multi-device sharding logic is tested on CPU with a forced
8-device host platform (the build machine has a single TPU chip reached
through a tunnel; correctness tests must never touch it).  The machine's
sitecustomize pre-imports jax with ``JAX_PLATFORMS=axon``, so an env-var
*default* is not enough — we override the live jax config before any backend
initializes (backends init lazily at first device use, which is after
conftest import).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _verify_cpu_backend():
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8


@pytest.fixture(scope="session", autouse=True)
def _reference_resurvey_tripwire():
    """SURVEY.md §0 protocol: all parity claims target the in-repo oracle
    because /root/reference was EMPTY at survey time.  If the mount is ever
    populated, that premise is void — fail loudly so the next session
    re-surveys and reconciles every VERIFY tag in SURVEY.md §2.1 before
    trusting any parity result."""
    ref = "/root/reference"
    if os.path.isdir(ref) and os.listdir(ref):
        pytest.fail(
            f"{ref} is now NON-EMPTY ({len(os.listdir(ref))} entries) but "
            "the oracle spec was built against an empty mount — re-survey "
            "required (SURVEY.md §0, VERDICT.md round 1 missing #4) before "
            "any parity claim is valid.",
            pytrace=False,
        )
