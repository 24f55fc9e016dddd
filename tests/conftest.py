"""Test configuration: force an 8-device CPU mesh before JAX initializes.

SURVEY.md §4.2.4: multi-device tests run on a virtual CPU mesh via
``xla_force_host_platform_device_count``; real-TPU paths are exercised by
bench.py / the driver, not the unit suite (keeps tests hermetic and fast).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the machine's sitecustomize pins jax_platforms to the axon TPU plugin,
# overriding the env var — force it back before any backend initializes
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def sim4(tmp_path_factory):
    """A small 4-genome simulated pan-genome written to disk (GFF fixtures)."""
    from peppan_tpu.utils import simulate

    sim = simulate.simulate(n_genomes=4, n_core=12, n_accessory=6,
                            mean_gene_codons=120, divergence=0.02, seed=7)
    out = tmp_path_factory.mktemp("sim4")
    paths = simulate.write_gff(sim, str(out))
    return sim, paths


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
