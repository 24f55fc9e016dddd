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
    snap = metrics.snapshot()
    assert (snap.get("vp_prefiltered", 0)
            + snap.get("vp_pass_certified", 0)) == pruned.sum()

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
    # soundness: every FAIL-pruned row fails the thresholds in the exact
    # run; every PASS-certified row passes them (round 4 two-sided)
    assert not keep_exact[pruned & (pf.identity < 1.0)].any()
    assert keep_exact[pruned & (pf.identity >= 1.0)].all()


def test_pass_certificate_sound_and_decisions_identical(tmp_path, rng):
    """Round-4 PASS side: rows certified PASS from the score alone must
    truly pass in the exact run, decisions must be identical, and the
    certificate must fire (non-vacuous) — under both coverage modes."""
    genes = _sim_store(tmp_path, seed=74, divergence=0.04)
    table = prs.build_minimizer_table(genes)
    cand, _, _ = prs.candidate_pairs(table)
    assert len(cand) > 20
    exact = prs.verify_pairs(genes, cand, batch=256)

    # 'max' coverage mode at PEPPAN similarity thresholds (FAIL side
    # can't prune at 0.65 — coef < 0 — so all pruning is PASS-side)
    ident, covp, mlen = 0.65, 0.5, 100
    metrics.reset()
    pf = prs.verify_pairs(genes, cand, batch=256,
                          prefilter=prs.Prefilter(ident, covp, covp,
                                                  cov_mode="max",
                                                  match_len=mlen))
    snap = metrics.snapshot()
    assert snap.get("vp_pass_certified", 0) > 0
    pruned = prs.prefiltered_rows(pf)

    def keep_of(h):
        cov_ok = np.maximum(h.qcov, h.tcov) >= covp
        cov_ok |= h.aln_len >= mlen
        # pass sentinels have qcov = 1.0 -> cov_ok already true
        cov_ok |= prs.prefiltered_rows(h) & (h.identity >= 1.0)
        return (h.identity >= ident) & cov_ok

    assert np.array_equal(keep_of(exact), keep_of(pf))
    assert np.array_equal(exact.score, pf.score)
    # soundness both ways: certified-pass rows pass exactly,
    # certified-fail rows fail exactly
    cert_pass = pruned & (pf.identity >= 1.0)
    cert_fail = pruned & (pf.identity < 1.0)
    assert keep_of(exact)[cert_pass].all()
    assert not keep_of(exact)[cert_fail].any()

    # 'both' coverage mode at cluster thresholds: two-sided pruning
    ident2, cov2 = 0.9, 0.9
    metrics.reset()
    pf2 = prs.verify_pairs(genes, cand, batch=256,
                           prefilter=prs.Prefilter(ident2, cov2, cov2))
    keep_exact = ((exact.identity >= ident2) & (exact.qcov >= cov2)
                  & (exact.tcov >= cov2))
    keep_pf = ((pf2.identity >= ident2) & (pf2.qcov >= cov2)
               & (pf2.tcov >= cov2))
    assert np.array_equal(keep_exact, keep_pf)
    pruned2 = prs.prefiltered_rows(pf2)
    cert_pass2 = pruned2 & (pf2.identity >= 1.0)
    assert metrics.snapshot().get("vp_pass_certified", 0) == cert_pass2.sum()
    assert keep_exact[cert_pass2].all()


def test_similarity_phase_prefilter_groups_identical(tmp_path):
    """The similarity phase's two-sided prefilter must produce identical
    ortholog grouping edges (pipeline-level decision equivalence)."""
    from peppan_tpu import pipeline
    from peppan_tpu.config import PipelineConfig
    from peppan_tpu.cluster import linclust as lc

    genes = _sim_store(tmp_path, seed=75, divergence=0.08,
                       paralog_families=2)
    clusters = lc.cluster_genes(genes, batch=256)
    cfg_on = PipelineConfig()
    cfg_off = dataclasses.replace(cfg_on, score_prefilter=False)
    g_on = pipeline._similarity_groups(genes, clusters, cfg_on)
    g_off = pipeline._similarity_groups(genes, clusters, cfg_off)
    assert np.array_equal(g_on, g_off)


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
