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


def test_divergence_outlier_genome_fallback():
    """Sparse-pair hardening: a genome pair with no shared single-copy
    groups must inherit the more diverged genome's marginal median, not
    the global median (one-outlier skew scenario)."""
    import numpy as np
    from peppan_tpu.cluster import split
    from peppan_tpu.io.tokens import GeneStore
    from peppan_tpu.ops import pairs as prs

    # 5 genomes x 1 gene per genome per group, 3 groups; genome 4 is the
    # outlier: its only observations are vs genome 0 at distance 0.15,
    # while genomes 0-3 sit at ~0.02 from each other.
    n_genomes, n_groups = 5, 3
    genome = np.repeat(np.arange(n_genomes), n_groups).astype(np.int32)
    group = np.tile(np.arange(n_groups), n_genomes).astype(np.int64)
    seqs = [np.zeros(60, np.int8)] * len(genome)
    store = GeneStore.from_sequences(seqs, genome=genome)
    pairs, ident = [], []
    for grp in range(n_groups):
        ids = np.flatnonzero(group == grp)
        for a in ids:
            for b in ids:
                if a >= b:
                    continue
                ga, gb = genome[a], genome[b]
                if ga < 4 and gb < 4:
                    pairs.append((a, b))
                    ident.append(0.98)
                elif 0 in (ga, gb):          # outlier only observed vs g0
                    pairs.append((a, b))
                    ident.append(0.85)
    pairs = np.asarray(pairs, np.int32)
    ident = np.asarray(ident, np.float32)
    ones = np.full(len(pairs), 60, np.int32)
    hits = prs.PairHits(pairs=pairs, score=ones, identity=ident,
                        qcov=np.ones(len(pairs), np.float32),
                        tcov=np.ones(len(pairs), np.float32),
                        matches=ones, aln_len=ones)
    div = split.estimate_divergence(store, group, hits, n_genomes)
    # observed entries
    assert abs(div.expect[0, 1] - 0.02) < 1e-4
    assert abs(div.expect[4, 0] - 0.15) < 1e-4
    # unobserved outlier pairs take the outlier marginal, not ~0.02
    for g in (1, 2, 3):
        assert div.expect[4, g] > 0.1, (g, div.expect[4, g])
    # symmetric + zero diagonal
    assert np.allclose(div.expect, div.expect.T)
    assert np.all(np.diag(div.expect) == 0)
