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


def test_split_oversized_group_subsampling(tmp_path):
    """Groups larger than max_members split via deterministic subsample +
    representative assignment (the path every group takes at hundreds of
    genomes)."""
    import numpy as np
    from peppan_tpu.io import gff
    from peppan_tpu.cluster import linclust, split
    from peppan_tpu import pipeline as pl

    sim = simulate.simulate(n_genomes=10, n_core=4, n_accessory=0,
                            mean_gene_codons=150, divergence=0.02,
                            paralog_families=2, paralog_divergence=0.2,
                            seed=31)
    paths = simulate.write_gff(sim, str(tmp_path / "gff"))
    _, genes = gff.load_genomes(paths)
    cfg = PipelineConfig(sw_batch=4096)
    clusters = linclust.cluster_genes(genes)
    group_root = pl._similarity_groups(genes, clusters, cfg)
    gog, _ = pl._dense_groups(group_root, genes.names)
    div = split.estimate_divergence(genes, gog, clusters.hits, 10)
    # force the oversized path: paralog groups have 20 members > 12
    new = split.split_groups(genes, gog, div, max_members=12)
    truth = [sim.truth[n] for n in genes.names]
    fw, bw = {}, {}
    for t, g in zip(truth, new):
        assert fw.setdefault(t, g) == g, (t, g)
        assert bw.setdefault(g, t) == t, (g, t)
