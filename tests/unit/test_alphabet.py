import numpy as np
import pytest

from peppan_tpu.io import alphabet as ab


def test_dna_roundtrip():
    s = "ACGTACGTNNAC"
    toks = ab.encode_dna(s)
    assert ab.decode_dna(toks) == s
    assert toks.dtype == np.int8


def test_encode_lowercase_and_ambiguous():
    assert np.array_equal(ab.encode_dna("acgt"), ab.encode_dna("ACGT"))
    assert (ab.encode_dna("RYKMSWBDHV") == ab.DNA_N).all()


def test_revcomp():
    toks = ab.encode_dna("AACGT")
    assert ab.decode_dna(ab.revcomp(toks)) == "ACGTT"
    # involution
    assert np.array_equal(ab.revcomp(ab.revcomp(toks)), toks)


def test_translate_standard_codons():
    # ATG GCC TAA -> M A *
    aa = ab.translate(ab.encode_dna("ATGGCCTAA"), 11)
    assert ab.decode_aa(aa) == "MA*"


def test_translate_table4_tga_is_trp():
    aa11 = ab.translate(ab.encode_dna("TGA"), 11)
    aa4 = ab.translate(ab.encode_dna("TGA"), 4)
    assert aa11[0] == ab.AA_STOP
    assert ab.decode_aa(aa4) == "W"


def test_translate_n_gives_x():
    aa = ab.translate(ab.encode_dna("ATGANTTAA"), 11)
    assert ab.decode_aa(aa) == "MX*"


def test_genetic_code_known_values():
    code = ab.genetic_code_table(11)
    enc = ab.encode_dna
    def codon_id(c):
        t = enc(c)
        return 16 * t[0] + 4 * t[1] + t[2]
    assert ab.decode_aa(code[[codon_id("AAA")]]) == "K"
    assert ab.decode_aa(code[[codon_id("TTT")]]) == "F"
    assert ab.decode_aa(code[[codon_id("ATG")]]) == "M"
    assert ab.decode_aa(code[[codon_id("TGG")]]) == "W"
    assert code[codon_id("TAA")] == ab.AA_STOP
    assert code[codon_id("TAG")] == ab.AA_STOP
    assert code[codon_id("TGA")] == ab.AA_STOP
    # exactly 3 stops in table 11, 2 in table 4
    assert (code[:64] == ab.AA_STOP).sum() == 3
    assert (ab.genetic_code_table(4)[:64] == ab.AA_STOP).sum() == 2


def test_blosum62_symmetric_and_known():
    m = ab.blosum62_matrix()
    assert np.array_equal(m, m.T)
    idx = {c: i for i, c in enumerate(ab.AA_ALPHA)}
    assert m[idx["W"], idx["W"]] == 11
    assert m[idx["C"], idx["C"]] == 9
    assert m[idx["A"], idx["A"]] == 4
    assert m[idx["I"], idx["V"]] == 3
    assert m[idx["E"], idx["D"]] == 2


def test_dna_score_matrix():
    m = ab.dna_score_matrix()
    assert m[0, 0] == 2 and m[0, 1] == -3
    # canonical semantics: N is always a mismatch, even vs itself
    assert (m[ab.DNA_N, :5] == -3).all()
    assert m[ab.DNA_PAD, 0] == -100


def test_aa_roundtrip():
    s = "MKLVX*"
    assert ab.decode_aa(ab.encode_aa(s)) == s


def test_translate6_matches_per_frame_translate(rng):
    """translate6's shared-sweep frames (incl. the 63 - rev_codon_idx
    reverse-strand identity and N masking) must be bit-identical to the
    six independent translate() calls, at every length mod 3."""
    import numpy as np
    from peppan_tpu.io import alphabet

    for L in (0, 1, 2, 3, 7, 300, 301, 302):
        t = rng.integers(0, 4, L).astype(np.int8)
        if L > 10:
            t[rng.integers(0, L, max(1, L // 20))] = 4
        got = alphabet.translate6(t, 11)
        rc = alphabet.revcomp(t)
        want = ([alphabet.translate(t[f:], 11) for f in range(3)]
                + [alphabet.translate(rc[f:], 11) for f in range(3)])
        for f in range(6):
            assert np.array_equal(got[f], want[f]), (L, f)
