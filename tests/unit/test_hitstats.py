"""Karlin-Altschul statistics (ops.hitstats) — the uberBlast
bit-score/e-value analog (SURVEY.md §2.2 diamond/blastn rows)."""

import numpy as np
import pytest


def test_lambda_satisfies_defining_equation():
    from peppan_tpu.ops import hitstats
    lam = hitstats.dna_lambda(2, -3)
    # sum p_i p_j exp(lam * s) == 1 at the root
    s = np.full((4, 4), -3.0)
    np.fill_diagonal(s, 2.0)
    p = np.full(4, 0.25)
    val = float((np.outer(p, p) * np.exp(lam * s)).sum())
    assert abs(val - 1.0) < 1e-9
    assert 0.5 < lam < 2.0          # sane range for 2/-3 DNA scoring


def test_blosum62_lambda_matches_published_ballpark():
    from peppan_tpu.ops import hitstats
    lam = hitstats.blosum62_lambda()
    # published ungapped BLOSUM62 lambda (half-bit units) is ~0.318;
    # ours uses our own background frequencies, allow a loose band
    assert 0.25 < lam < 0.40


def test_lambda_rejects_positive_mean():
    from peppan_tpu.ops import hitstats
    s = np.full((4, 4), 2, int)     # all-positive scores: no root
    with pytest.raises(ValueError):
        hitstats.karlin_lambda(s, np.full(4, 0.25))


def test_bitscore_and_evalue_monotonicity():
    from peppan_tpu.ops import hitstats
    lam = hitstats.dna_lambda()
    scores = np.array([100, 200, 400])
    bits = hitstats.bit_scores(scores, lam)
    assert (np.diff(bits) > 0).all()
    ev = hitstats.evalues(scores, lam, np.array([300, 300, 300]), 1e6)
    assert (np.diff(ev) < 0).all()          # higher score -> smaller E
    # doubling the search space doubles E
    ev2 = hitstats.evalues(scores, lam, np.array([300, 300, 300]), 2e6)
    np.testing.assert_allclose(ev2, 2 * ev)


def test_save_hits_output(tmp_path):
    """--save_hits writes the map.tsv hit table with bitscore/evalue
    columns consistent with hitstats."""
    import sys
    import tempfile

    from peppan_tpu import pipeline
    from peppan_tpu.config import PipelineConfig
    from peppan_tpu.ops import hitstats
    from peppan_tpu.utils import simulate

    d = str(tmp_path)
    sim = simulate.simulate(n_genomes=3, seed=11)
    paths = simulate.write_gff(sim, d)
    res = pipeline.run(paths, PipelineConfig(prefix="H", save_hits=True),
                       out_dir=d)
    assert "map" in res.outputs
    rows = open(res.outputs["map"]).read().strip().split("\n")
    header = rows[0].lstrip("#").split("\t")
    assert header[-2:] == ["bitscore", "evalue"]
    assert len(rows) - 1 == len(res.map_hits)
    lam = hitstats.dna_lambda()
    r1 = rows[1].split("\t")
    score = int(r1[6])
    np.testing.assert_allclose(float(r1[10]),
                               hitstats.bit_scores(score, lam), rtol=0.01)
