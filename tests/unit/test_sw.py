"""Kernel-vs-oracle equality tests for banded Smith-Waterman.

SURVEY.md §4.2.2: every device alignment path must match the numpy oracle
bit-for-bit on random sequences (score, coordinates, matches, aln_len).
"""

import numpy as np
import pytest

from peppan_tpu.io import alphabet as ab
from peppan_tpu.ops import sw, sw_oracle

GO, GE = 5, 2
DNA_SUB = ab.dna_score_matrix()


def _mutate_with_indels(rng, seq, sub_rate=0.05, indel_rate=0.01):
    out = []
    for c in seq:
        r = rng.random()
        if r < indel_rate / 2:
            continue  # deletion
        if r < indel_rate:
            out.append(rng.integers(0, 4))  # insertion before
        if rng.random() < sub_rate:
            out.append((c + rng.integers(1, 4)) % 4)
        else:
            out.append(c)
    return np.array(out, dtype=np.int8)


def _pad(seqs, width):
    out = np.full((len(seqs), width), ab.DNA_PAD, dtype=np.int8)
    for i, s in enumerate(seqs):
        out[i, :len(s)] = s[:width]
    return out


def _run_both(qs, ts, band, width_q, width_t, with_stats=True):
    qp = _pad(qs, width_q)
    tp = sw.prep_target_tokens(_pad(ts, width_t))
    res = sw.sw_banded(qp, tp, scorer=sw.dna_scorer(), gap_open=GO,
                       gap_extend=GE, band=band, with_stats=with_stats)
    res = {k: np.asarray(v) for k, v in res.items()}
    hits = [sw_oracle.sw_banded_ref(q, t, DNA_SUB, GO, GE, band=band)
            for q, t in zip(qs, ts)]
    return res, hits


def _assert_equal(res, hits, with_stats=True):
    for i, h in enumerate(hits):
        assert res["score"][i] == h.score, (i, res["score"][i], h.score)
        if h.score == 0:
            continue
        assert res["qend"][i] == h.qend, (i, "qend")
        assert res["tend"][i] == h.tend, (i, "tend")
        if with_stats:
            assert res["matches"][i] == h.matches, (i, "matches")
            assert res["aln_len"][i] == h.aln_len, (i, "aln_len")
            assert res["qstart"][i] == h.qstart, (i, "qstart")
            assert res["tstart"][i] == h.tstart, (i, "tstart")


def test_identical_sequences(rng):
    qs = [rng.integers(0, 4, size=100).astype(np.int8) for _ in range(4)]
    res, hits = _run_both(qs, qs, band=64, width_q=128, width_t=128)
    for i, q in enumerate(qs):
        assert res["score"][i] == 2 * len(q)
        assert res["matches"][i] == len(q)
        assert res["aln_len"][i] == len(q)
        assert res["qstart"][i] == 0 and res["qend"][i] == len(q) - 1
    _assert_equal(res, hits)


def test_known_toy_alignment():
    # q=ACGTACGT vs t=ACGTTACGT : one insertion in target
    q = ab.encode_dna("ACGTACGT")
    t = ab.encode_dna("ACGTTACGT")
    res, hits = _run_both([q], [t], band=16, width_q=16, width_t=16)
    # gapped ACGT-ACGT/ACGTTACGT scores 2*8-(5+2)=9, but the ungapped local
    # alignment q[3:8]="TACGT" vs t[4:9]="TACGT" scores 2*5=10 and wins.
    assert res["score"][0] == 10
    assert res["matches"][0] == 5
    assert res["aln_len"][0] == 5
    assert res["qstart"][0] == 3 and res["tstart"][0] == 4
    _assert_equal(res, hits)


def test_no_alignment_scores_zero(rng):
    q = np.zeros(50, dtype=np.int8)        # AAAA...
    t = np.full(50, 1, dtype=np.int8)      # CCCC...
    res, hits = _run_both([q], [t], band=32, width_q=64, width_t=64)
    assert res["score"][0] == 0
    _assert_equal(res, hits)


@pytest.mark.parametrize("band,wq,wt", [(32, 128, 128), (64, 128, 192),
                                        (128, 256, 256)])
def test_random_mutated_pairs(rng, band, wq, wt):
    qs, ts = [], []
    for _ in range(12):
        L = int(rng.integers(40, wq))
        q = rng.integers(0, 4, size=L).astype(np.int8)
        t = _mutate_with_indels(rng, q, sub_rate=0.08, indel_rate=0.02)[:wt]
        qs.append(q)
        ts.append(t)
    res, hits = _run_both(qs, ts, band=band, width_q=wq, width_t=wt)
    _assert_equal(res, hits)


def test_random_unrelated_pairs(rng):
    qs = [rng.integers(0, 4, size=int(rng.integers(30, 120))).astype(np.int8)
          for _ in range(8)]
    ts = [rng.integers(0, 4, size=int(rng.integers(30, 120))).astype(np.int8)
          for _ in range(8)]
    res, hits = _run_both(qs, ts, band=64, width_q=128, width_t=128)
    _assert_equal(res, hits)


def test_score_only_matches_stats_mode(rng):
    qs = [rng.integers(0, 4, size=90).astype(np.int8) for _ in range(6)]
    ts = [_mutate_with_indels(rng, q) for q in qs]
    r1, _ = _run_both(qs, ts, band=64, width_q=128, width_t=128,
                      with_stats=True)
    r2, _ = _run_both(qs, ts, band=64, width_q=128, width_t=128,
                      with_stats=False)
    assert np.array_equal(r1["score"], r2["score"])


def _run_protein(qs, ts, wq, wt, band=64):
    b62 = ab.blosum62_matrix()
    qp = np.full((len(qs), wq), ab.AA_PAD, np.int8)
    tp = np.full((len(ts), wt), ab.AA_PAD, np.int8)
    for i, (q, t) in enumerate(zip(qs, ts)):
        qp[i, :len(q)] = q
        tp[i, :len(t)] = t
    res = sw.sw_banded(qp, tp, scorer=sw.matrix_scorer(b62), gap_open=11,
                       gap_extend=1, band=band, with_stats=True,
                       n_real_tokens=20, qpad=ab.AA_PAD, tpad=ab.AA_PAD)
    res = {k: np.asarray(v) for k, v in res.items()}
    hits = [sw_oracle.sw_banded_ref(q, t, b62, 11, 1, band=band,
                                    n_real_tokens=20)
            for q, t in zip(qs, ts)]
    return res, hits


def test_protein_mode_blosum62(rng):
    qs, ts = [], []
    for _ in range(6):
        L = int(rng.integers(30, 100))
        q = rng.integers(0, 20, size=L).astype(np.int8)
        t = q.copy()
        mut = rng.random(L) < 0.1
        t[mut] = rng.integers(0, 20, size=mut.sum())
        qs.append(q)
        ts.append(t)
    res, hits = _run_protein(qs, ts, 128, 128)
    _assert_equal(res, hits)


def test_protein_offset_alignment_full_stats(rng):
    """Advisor round-1 regression: alignments NOT anchored at (0, 0).

    The kernel's internal band padding used DNA pad tokens (5/6) that
    alias real residues under BLOSUM62 (5='G' scores +6, 6='H' scores
    +8), inflating score/qstart/aln_len whenever the band's unclipped
    cells sat outside the real matrix.  Offset starts + full stats
    equality with the oracle detect that leak."""
    qs, ts = [], []
    # alignment starts at i=0, j>0 and ends before the target end
    for _ in range(6):
        L = int(rng.integers(40, 80))
        core = rng.integers(0, 20, size=L).astype(np.int8)
        pre = rng.integers(1, 30)
        post = rng.integers(1, 30)
        t = np.concatenate([
            rng.integers(0, 20, size=pre).astype(np.int8), core,
            rng.integers(0, 20, size=post).astype(np.int8)])
        qs.append(core)
        ts.append(t)
    res, hits = _run_protein(qs, ts, 128, 192, band=64)
    _assert_equal(res, hits)


def test_protein_g_prefixed_target_pad_leak(rng):
    """The advisor's literal reproduction: query vs a G-prefixed target
    previously returned score 360 / qstart=-4 where the oracle says 336.
    qstart must never be negative under a matrix scorer."""
    q = rng.integers(0, 20, size=60).astype(np.int8)
    t = np.concatenate([np.full(8, 5, np.int8), q])   # 5 = 'G'
    res, hits = _run_protein([q], [t], 64, 128, band=64)
    _assert_equal(res, hits)
    assert res["qstart"][0] >= 0 and res["tstart"][0] >= 0


def test_traceback_consistent_with_banded(rng):
    q = rng.integers(0, 4, size=80).astype(np.int8)
    t = _mutate_with_indels(rng, q, sub_rate=0.05, indel_rate=0.02)
    hit, cigar = sw_oracle.sw_traceback(q, t, DNA_SUB, GO, GE)
    href = sw_oracle.sw_banded_ref(q, t, DNA_SUB, GO, GE)  # full band
    assert hit.score == href.score
    assert hit.matches == href.matches
    assert hit.aln_len == href.aln_len
    # cigar lengths add up
    q_cols = sum(ln for op, ln in cigar if op in "MI")
    t_cols = sum(ln for op, ln in cigar if op in "MD")
    assert q_cols == hit.qend - hit.qstart + 1
    assert t_cols == hit.tend - hit.tstart + 1


def test_c0_seed_diagonal(rng):
    # target = 200 junk bases + query: true alignment sits on offset +200,
    # far outside a 32-lane band at c0=0 but centred by c0=200
    q = rng.integers(0, 4, size=100).astype(np.int8)
    t = np.concatenate([rng.integers(0, 4, size=200).astype(np.int8), q])
    qp = _pad([q], 128)
    tp = sw.prep_target_tokens(_pad([t], 384))
    hit_c0 = sw_oracle.sw_banded_ref(q, t, DNA_SUB, GO, GE, band=32, c0=200)
    res = sw.sw_banded(qp, tp, scorer=sw.dna_scorer(), gap_open=GO,
                       gap_extend=GE, band=32, c0=200, with_stats=True)
    assert int(res["score"][0]) == hit_c0.score == 200
    assert int(res["tstart"][0]) == 200
    res0 = sw.sw_banded(qp, tp, scorer=sw.dna_scorer(), gap_open=GO,
                        gap_extend=GE, band=32, c0=0, with_stats=False)
    assert int(res0["score"][0]) < 200


def test_odd_c0_rejected(rng):
    qp = _pad([rng.integers(0, 4, 50).astype(np.int8)], 64)
    with pytest.raises(ValueError):
        sw.sw_banded(qp, qp, scorer=sw.dna_scorer(), band=32, c0=3)


def test_n_tokens_score_as_mismatch(rng):
    # q with N region vs its clean copy: N columns are mismatches
    q = rng.integers(0, 4, size=60).astype(np.int8)
    t = q.copy()
    q[20:25] = ab.DNA_N
    res, hits = _run_both([q], [t], band=32, width_q=64, width_t=64)
    _assert_equal(res, hits)
    assert res["matches"][0] <= 55


def test_stats_mode_width_guard(rng):
    # packed 16-bit stats fields reject oversized widths with a clear error
    q = np.full((8, 40000), 5, np.int8)
    with pytest.raises(ValueError, match="16-bit"):
        sw.sw_banded(q, q, scorer=sw.dna_scorer(), band=64, with_stats=True)
    # score-only mode has no such limit (traced fine)
    r = sw.sw_banded(q[:, :256], q[:, :256], scorer=sw.dna_scorer(),
                     band=64, with_stats=False)
    assert "score" in r
