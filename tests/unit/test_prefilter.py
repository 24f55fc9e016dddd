"""Two-pass score-prefilter verification (SURVEY §7.3.3 applied to pair
verification): the certificate must be sound (never drops a pair that
passes the thresholds), decisions and downstream models bit-identical to
single-pass, and the pruning non-vacuous."""

import dataclasses

import numpy as np

from peppan_tpu.cluster import linclust, split
from peppan_tpu.io import gff
from peppan_tpu.ops import pairs as prs
from peppan_tpu.utils import metrics, simulate


def _sim_store(tmp_path, seed=71, **kw):
    sim = simulate.simulate(n_genomes=4, n_core=10, n_accessory=4,
                            seed=seed, **kw)
    paths = simulate.write_gff(sim, str(tmp_path / "gff"))
    _, genes = gff.load_genomes(paths)
    return genes


def test_floor_certificate_sound_and_decisions_identical(tmp_path, rng):
    genes = _sim_store(tmp_path)
    table = prs.build_minimizer_table(genes)
    cand, _, _ = prs.candidate_pairs(table)
    assert len(cand) > 20
    ident, cov = 0.9, 0.9
    exact = prs.verify_pairs(genes, cand, batch=256)
    metrics.reset()
    pf = prs.verify_pairs(genes, cand, batch=256,
                          prefilter=prs.Prefilter(ident, cov, cov))
    pruned = prs.prefiltered_rows(pf)
    assert metrics.snapshot().get("vp_prefiltered", 0) == pruned.sum()

    keep_exact = ((exact.identity >= ident) & (exact.qcov >= cov)
                  & (exact.tcov >= cov))
    keep_pf = ((pf.identity >= ident) & (pf.qcov >= cov)
               & (pf.tcov >= cov))
    # identical decisions...
    assert np.array_equal(keep_exact, keep_pf)
    # ...scores always exact (pass 1 is bit-equal to the stats engine)...
    assert np.array_equal(exact.score, pf.score)
    # ...and every surviving row carries fully exact stats
    for f in dataclasses.fields(prs.PairHits):
        a, b = getattr(exact, f.name), getattr(pf, f.name)
        assert np.array_equal(a[~pruned], b[~pruned]), f.name
    # soundness: every pruned row fails the thresholds in the exact run
    assert not keep_exact[pruned].any()


def test_cluster_and_divergence_bit_identical(tmp_path):
    genes = _sim_store(tmp_path, seed=72, paralog_families=3,
                       divergence=0.06)
    on = linclust.cluster_genes(genes, batch=256, score_prefilter=True)
    off = linclust.cluster_genes(genes, batch=256, score_prefilter=False)
    assert np.array_equal(on.root, off.root)
    assert np.array_equal(on.exemplar, off.exemplar)
    assert np.array_equal(on.exemplar_ids, off.exemplar_ids)
    # the prefilter must actually prune in this fixture, or the test is
    # vacuous
    assert prs.prefiltered_rows(on.hits).any()

    # a coarse similarity grouping (same-root) exercises the sentinel
    # re-verification inside estimate_divergence
    labels = on.root.copy()
    div_on = split.estimate_divergence(genes, labels, on.hits, 4, batch=256)
    div_off = split.estimate_divergence(genes, labels, off.hits, 4,
                                        batch=256)
    assert np.array_equal(div_on.expect, div_off.expect)
    assert div_on.sigma == div_off.sigma


def test_prefilter_pipeline_outputs_byte_identical(tmp_path):
    from peppan_tpu import pipeline
    from peppan_tpu.config import PipelineConfig

    sim = simulate.simulate(n_genomes=3, n_core=8, n_accessory=3, seed=73)
    paths = simulate.write_gff(sim, str(tmp_path / "gff"))
    r_on = pipeline.run(paths, PipelineConfig(prefix="ON"),
                        out_dir=str(tmp_path / "on"))
    r_off = pipeline.run(paths, PipelineConfig(prefix="OFF",
                                               score_prefilter=False),
                         out_dir=str(tmp_path / "off"))
    for k in r_on.outputs:
        a = open(r_on.outputs[k], "rb").read()
        b = open(r_off.outputs[k], "rb").read()
        assert a == b, k
