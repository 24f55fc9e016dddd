"""Pipeline determinism across device counts (SURVEY §4.2.3): outputs on a
4x2 virtual mesh must be byte-identical to the single-device run."""

import numpy as np
import pytest

from peppan_tpu import pipeline
from peppan_tpu.config import PipelineConfig
from peppan_tpu.utils import simulate

pytestmark = pytest.mark.slow


def test_mesh_run_matches_single_device(tmp_path):
    sim = simulate.simulate(n_genomes=4, n_core=10, n_accessory=4,
                            paralog_families=1, paralog_divergence=0.2,
                            seed=91)
    paths = simulate.write_gff(sim, str(tmp_path / "gff"))
    r1 = pipeline.run(paths, PipelineConfig(prefix="A"),
                      out_dir=str(tmp_path / "o1"))
    r2 = pipeline.run(paths, PipelineConfig(prefix="A", mesh_data=4,
                                            mesh_db=2),
                      out_dir=str(tmp_path / "o2"))
    assert np.array_equal(r1.group_of_gene, r2.group_of_gene)
    for k in r1.outputs:
        a = open(r1.outputs[k], "rb").read()
        b = open(r2.outputs[k], "rb").read()
        assert a == b, f"{k} differs between mesh and single-device runs"
    # pod-memory mode: token store rows sharded over 'db' instead of
    # replicated (VERDICT r1 item 6) — still byte-identical
    r3 = pipeline.run(paths, PipelineConfig(prefix="A", mesh_data=4,
                                            mesh_db=2, shard_store=True),
                      out_dir=str(tmp_path / "o3"))
    assert np.array_equal(r1.group_of_gene, r3.group_of_gene)
    for k in r1.outputs:
        a = open(r1.outputs[k], "rb").read()
        b = open(r3.outputs[k], "rb").read()
        assert a == b, f"{k} differs between sharded-store and single runs"
