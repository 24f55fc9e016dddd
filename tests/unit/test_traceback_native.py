"""Native C++ SW traceback vs python oracle (bit-equality) and the
CIGAR-level disruption classifier (SURVEY.md §7.3.3 two-pass plan)."""

import numpy as np
import pytest

from peppan_tpu.assign import disrupt
from peppan_tpu.io import alphabet as ab, native
from peppan_tpu.ops import sw_oracle

GO, GE = 5, 2
DNA = ab.dna_score_matrix().astype(np.int32)


def _mutate(rng, seq, sub_rate=0.05, indel_rate=0.01):
    out = []
    for c in seq:
        r = rng.random()
        if r < indel_rate / 2:
            continue
        if r < indel_rate:
            out.append(rng.integers(0, 4))
        if rng.random() < sub_rate:
            out.append((c + rng.integers(1, 4)) % 4)
        else:
            out.append(c)
    return np.array(out, dtype=np.int8)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_traceback_equals_oracle(rng):
    for _ in range(10):
        L = int(rng.integers(40, 300))
        q = rng.integers(0, 4, size=L).astype(np.int8)
        t = _mutate(rng, q, sub_rate=0.08, indel_rate=0.03)
        stats, cigar = native.sw_traceback(q, t, DNA, GO, GE)
        hit, cigar_ref = sw_oracle.sw_traceback(q, t, DNA, GO, GE)
        assert stats["score"] == hit.score
        assert stats["qstart"] == hit.qstart
        assert stats["qend"] == hit.qend
        assert stats["tstart"] == hit.tstart
        assert stats["tend"] == hit.tend
        assert stats["matches"] == hit.matches
        assert stats["aln_len"] == hit.aln_len
        assert cigar == cigar_ref


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_native_traceback_protein_matrix(rng):
    b62 = ab.blosum62_matrix().astype(np.int32)
    for _ in range(5):
        L = int(rng.integers(30, 120))
        q = rng.integers(0, 20, size=L).astype(np.int8)
        t = _mutate(rng, q, sub_rate=0.15, indel_rate=0.03) % 20
        stats, cigar = native.sw_traceback(q, t, b62, 11, 1,
                                           n_real_tokens=20)
        hit, cigar_ref = sw_oracle.sw_traceback(q, t, b62, 11, 1,
                                                n_real_tokens=20)
        assert stats["score"] == hit.score
        assert stats["matches"] == hit.matches
        assert cigar == cigar_ref


def _clean_cds(rng, n_codons=120):
    from peppan_tpu.utils import simulate
    return simulate._random_cds(rng, n_codons)


def test_classify_frameshift_deletion_boundary(rng):
    """Engineered 1-bp deletion mid-gene: classify() must flag a frameshift
    at (approximately) the deletion position."""
    gene = _clean_cds(rng, 120)          # 360 bp
    pos = 181
    locus = np.concatenate([gene[:pos], gene[pos + 1:]])
    stats, cigar = disrupt.region_traceback(gene, locus)
    d = disrupt.classify(stats, cigar, gene, locus)
    assert d.frameshift_pos >= 0
    # the gap can slide within a repeat run; allow a few bp of play
    assert abs(d.frameshift_pos - pos) <= 6


def test_classify_premature_stop_position(rng):
    gene = _clean_cds(rng, 120)
    locus = gene.copy()
    # codon 40 -> TAA (positions 120..122)
    locus[120:123] = [3, 0, 0]
    stats, cigar = disrupt.region_traceback(gene, locus)
    d = disrupt.classify(stats, cigar, gene, locus)
    assert d.frameshift_pos == -1
    assert d.premature_stop_pos == 120


def test_classify_intact_and_inframe_indel(rng):
    gene = _clean_cds(rng, 120)
    stats, cigar = disrupt.region_traceback(gene, gene)
    d = disrupt.classify(stats, cigar, gene, gene)
    assert not d.disrupted
    # clean in-frame 3-bp deletion: parity screen would flag it wrongly;
    # the CIGAR pass must NOT call a frameshift (no stop introduced check
    # depends on sequence, so only assert no frameshift)
    locus = np.concatenate([gene[:150], gene[153:]])
    stats, cigar = disrupt.region_traceback(gene, locus)
    d = disrupt.classify(stats, cigar, gene, locus)
    assert d.frameshift_pos == -1


def test_terminal_stop_not_premature(rng):
    gene = _clean_cds(rng, 120)
    stats, cigar = disrupt.region_traceback(gene, gene)
    d = disrupt.classify(stats, cigar, gene, gene)
    assert d.premature_stop_pos == -1


def test_stop_frames_counts(rng):
    gene = _clean_cds(rng, 120)
    # intact CDS in frame 0: frame 0 clean -> k < 3
    assert disrupt.stop_frames(gene) < 3
