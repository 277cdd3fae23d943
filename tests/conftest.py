import os

# Tests run on a virtual 8-device CPU mesh; the real-TPU path is exercised by
# bench.py and the driver's compile checks.  The axon sitecustomize forces
# JAX_PLATFORMS=axon programmatically, so the env var alone is not enough —
# we must also update the config after import.
import jax

if os.environ.get("LRA_TPU_TEST_TPU"):
    # opt-in: run the suite against the real TPU (e.g. the Pallas
    # equivalence test, which skips off-TPU)
    pass
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")

# persist CPU-kernel compilations across test runs (same cache dir keyed
# by platform, so TPU entries don't collide)
from lra_tpu import enable_compile_cache

enable_compile_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
