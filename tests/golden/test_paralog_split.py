"""Phase-6 paralog splitting end-to-end: simulated paralog families must be
separated from their ortholog families (SURVEY.md §3.1 phase 6)."""

import numpy as np
import pytest

from peppan_tpu import pipeline
from peppan_tpu.config import PipelineConfig
from peppan_tpu.utils import simulate


@pytest.fixture(scope="module")
def sim_par(tmp_path_factory):
    sim = simulate.simulate(n_genomes=4, n_core=10, n_accessory=0,
                            mean_gene_codons=150, divergence=0.02,
                            paralog_families=3, paralog_divergence=0.2,
                            seed=11)
    out = tmp_path_factory.mktemp("simpar")
    paths = simulate.write_gff(sim, str(out))
    return sim, paths


def _partition_equal(a, b):
    fw, bw = {}, {}
    for x, y in zip(a, b):
        if fw.setdefault(x, y) != y or bw.setdefault(y, x) != x:
            return False
    return True


def test_split_recovers_truth(sim_par, tmp_path_factory):
    sim, paths = sim_par
    out = tmp_path_factory.mktemp("split_out")
    cfg = PipelineConfig(prefix="SPL", sw_batch=4096)
    res = pipeline.run(paths, cfg, out_dir=str(out))
    truth = [sim.truth[n] for n in res.gene_store.names]
    # paralog families exist in truth
    assert any(t.endswith("_par1") for t in truth)
    assert _partition_equal(truth, list(res.group_of_gene))


def test_no_split_when_disabled(sim_par, tmp_path_factory):
    sim, paths = sim_par
    out = tmp_path_factory.mktemp("nosplit_out")
    cfg = PipelineConfig(prefix="NOS", paralog_split=False, sw_batch=4096)
    res = pipeline.run(paths, cfg, out_dir=str(out))
    truth = [sim.truth[n] for n in res.gene_store.names]
    # with splitting off, ortholog+paralog collapse -> partitions differ
    assert not _partition_equal(truth, list(res.group_of_gene))
