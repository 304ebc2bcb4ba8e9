"""Test configuration: virtual 8-device CPU mesh + float64.

Parity tests run on CPU in float64 so golden numbers from the
reference binary (which is double precision, utilities.h:462) compare
at tight tolerance.  Sharding tests use the 8 virtual CPU devices.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# Force CPU even when the session environment selects a TPU backend:
# parity tests need float64, which TPUs emulate slowly, and the 8
# virtual devices above need the host platform.  The env-var route
# (JAX_PLATFORMS=cpu) is unreliable here - the installed TPU plugin
# overrides it - but the config API is honored.
# PHYML_TEST_TPU=1 skips the CPU forcing so the hardware-gated tests
# (e.g. test_shard_map_pallas_on_tpu_hardware) can run on a real
# chip: run ONLY those tests under it - the f64 parity tests would
# crawl on emulated float64.
if not os.environ.get("PHYML_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
EXAMPLES = "/root/reference/examples"


@pytest.fixture(scope="session")
def nucleic():
    from phyml_tpu.io.alignment import read_alignment
    return read_alignment(os.path.join(EXAMPLES, "nucleic"),
                          datatype="nt")


@pytest.fixture(scope="session")
def proteic():
    from phyml_tpu.io.alignment import read_alignment
    return read_alignment(os.path.join(EXAMPLES, "proteic"),
                          datatype="aa")


@pytest.fixture(scope="session")
def ref_tree_a(nucleic):
    from phyml_tpu.topology import Topology
    with open(os.path.join(GOLDEN, "ref_tree_A.nwk")) as fh:
        return Topology.from_newick(fh.read(), nucleic.names)
