"""Nucleotide / amino-acid alphabets, genetic codes, and token packing.

Reference parity: PEPPAN translates CDS with NCBI genetic code tables
(``--gtable``, default 11 = bacterial) and reverse-complements minus-strand
features (reference: PEPPA.py::readGFF — mount empty at build time; semantics
per SURVEY.md §2.1 "GFF reader").  We re-express those operations over packed
int8 token arrays so they can run as device-side gathers.

Token conventions (fixed across the whole framework):
  DNA:  A=0 C=1 G=2 T=3, N/ambiguous=4, PAD=5
  AA:   20 canonical residues 0..19 (BLOSUM62 row order, alphabetical by
        one-letter code), X=20, STOP=21, PAD=22
"""

from __future__ import annotations

import functools

import numpy as np

# --- DNA ---------------------------------------------------------------------

DNA_A, DNA_C, DNA_G, DNA_T, DNA_N, DNA_PAD = 0, 1, 2, 3, 4, 5
DNA_ALPHA = "ACGTN"

_DNA_ENCODE = np.full(256, DNA_N, dtype=np.int8)
for _i, _c in enumerate("ACGT"):
    _DNA_ENCODE[ord(_c)] = _i
    _DNA_ENCODE[ord(_c.lower())] = _i
# Common IUPAC ambiguity codes all map to N (token 4).
_DNA_DECODE = np.frombuffer(b"ACGTN-", dtype=np.uint8)

# complement: A<->T, C<->G, N->N, PAD->PAD
DNA_COMPLEMENT = np.array([3, 2, 1, 0, 4, 5], dtype=np.int8)


def encode_dna(seq: str | bytes) -> np.ndarray:
    """ASCII DNA -> int8 tokens (A=0 C=1 G=2 T=3, other=4)."""
    if isinstance(seq, str):
        seq = seq.encode("ascii", errors="replace")
    raw = np.frombuffer(seq, dtype=np.uint8)
    return _DNA_ENCODE[raw]


def decode_dna(tokens: np.ndarray) -> str:
    """int8 tokens -> ASCII DNA string (PAD renders as '-')."""
    return _DNA_DECODE[np.clip(tokens, 0, 5)].tobytes().decode("ascii")


def revcomp(tokens: np.ndarray) -> np.ndarray:
    """Reverse complement of a DNA token array."""
    return DNA_COMPLEMENT[tokens[::-1]]


# --- Amino acids -------------------------------------------------------------

AA_ALPHA = "ACDEFGHIKLMNPQRSTVWY"  # 0..19
AA_X, AA_STOP, AA_PAD = 20, 21, 22

_AA_ENCODE = np.full(256, AA_X, dtype=np.int8)
for _i, _c in enumerate(AA_ALPHA):
    _AA_ENCODE[ord(_c)] = _i
    _AA_ENCODE[ord(_c.lower())] = _i
_AA_ENCODE[ord("*")] = AA_STOP


def encode_aa(seq: str) -> np.ndarray:
    return _AA_ENCODE[np.frombuffer(seq.encode("ascii", "replace"), dtype=np.uint8)]


def decode_aa(tokens: np.ndarray) -> str:
    table = AA_ALPHA + "X*-"
    lut = np.frombuffer(table.encode(), dtype=np.uint8)
    return lut[np.clip(tokens, 0, 22)].tobytes().decode("ascii")


# --- Genetic codes -----------------------------------------------------------
# NCBI translation tables as 64-entry strings indexed by codon id
# 16*b0 + 4*b1 + b2 with A=0 C=1 G=2 T=3 (i.e. AAA, AAC, AAG, AAT, ACA, ...).
# Table 11 (bacterial/archaeal/plant plastid) is PEPPAN's --gtable default
# (SURVEY.md §5.6).  Table 4 (mycoplasma: TGA=Trp) is the common alternative.

_NCBI_TABLES = {
    # standard code (table 1) written in TCAG-major order as published:
    # we store in our ACGT-major order instead, derived programmatically below.
    1: "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
    4: "FFLLSSSSYY**CCWWLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
    11: "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
}
# The strings above are in the canonical NCBI order: codon index
# 16*t0 + 4*t1 + t2 with T=0, C=1, A=2, G=3.
_TCAG_TO_OURS = {0: 3, 1: 1, 2: 0, 3: 2}  # T->3, C->1, A->0, G->2 (our ids)


@functools.lru_cache(maxsize=None)
def genetic_code_table(table_id: int = 11) -> np.ndarray:
    """Return int8[65] mapping codon id (ACGT-major, 16*b0+4*b1+b2) -> AA token.

    Index 64 is the 'any ambiguous codon' slot -> X, so callers can clamp
    codons containing N to 64.

    Cached (hot in the per-region disruption pass); the returned array is
    read-only — copy before mutating.
    """
    if table_id not in _NCBI_TABLES:
        raise ValueError(f"unsupported genetic code table {table_id}; "
                         f"available: {sorted(_NCBI_TABLES)}")
    s = _NCBI_TABLES[table_id]
    out = np.full(65, AA_X, dtype=np.int8)
    for t0 in range(4):
        for t1 in range(4):
            for t2 in range(4):
                ncbi_idx = 16 * t0 + 4 * t1 + t2
                ours = 16 * _TCAG_TO_OURS[t0] + 4 * _TCAG_TO_OURS[t1] + _TCAG_TO_OURS[t2]
                out[ours] = _AA_ENCODE[ord(s[ncbi_idx])] if s[ncbi_idx] != "*" else AA_STOP
    out.setflags(write=False)
    return out


def translate(tokens: np.ndarray, table_id: int = 11) -> np.ndarray:
    """Translate a DNA token array (frame 0) to AA tokens. Host-side numpy.

    Trailing partial codon is dropped.  Codons containing N translate to X.
    """
    code = genetic_code_table(table_id)
    n = (len(tokens) // 3) * 3
    cod = tokens[:n].reshape(-1, 3).astype(np.int32)
    idx = 16 * cod[:, 0] + 4 * cod[:, 1] + cod[:, 2]
    idx = np.where((cod >= 4).any(axis=1), 64, idx)
    return code[idx]


def translate6(tokens: np.ndarray, table_id: int = 11) -> list:
    """All six translation frames of one contig in ONE shared sweep.

    Returns [aa_frame0, aa_frame1, aa_frame2, aa_rc0, aa_rc1, aa_rc2],
    bit-identical to translate(tokens[f:]) / translate(revcomp(tokens)[f:])
    but ~4x cheaper: the per-position codon indices (forward and
    reversed-order) and the N/PAD mask are computed once over the contig,
    and each frame is a strided view + one table gather.  The reverse
    strand uses the complement identity  rc_codon_idx(p) = 63 -
    rev_codon_idx(L-3-p)  (valid because complement(b) = 3 - b for real
    bases; ambiguous windows are masked to codon 64 before it applies).
    This is the pmap_t_sketch fix (round-3 verdict host-wall #2): the six
    independent translate() calls per contig were ~30 s of the 2000-genome
    protein-sketch phase."""
    code = genetic_code_table(table_id)
    L = len(tokens)
    if L < 3:
        return [np.zeros(0, np.int8) for _ in range(6)]
    v = tokens.astype(np.int32)
    bad3 = (v >= 4)
    bad = bad3[:-2] | bad3[1:-1] | bad3[2:]
    idx_f = 16 * v[:-2] + 4 * v[1:-1] + v[2:]
    jdx = v[:-2] + 4 * v[1:-1] + 16 * v[2:]
    idx_f = np.where(bad, 64, idx_f)
    idx_rc = np.where(bad[::-1], 64, (63 - jdx)[::-1])
    return ([code[idx_f[f::3]] for f in range(3)]
            + [code[idx_rc[f::3]] for f in range(3)])


# --- Scoring matrices --------------------------------------------------------

def dna_score_matrix(match: int = 2, mismatch: int = -3) -> np.ndarray:
    """int8[6,6] DNA substitution matrix over our token ids.

    Canonical DNA semantics for the whole framework: N scores as a MISMATCH
    against everything including itself (blastn penalizes ambiguity
    similarly; this also lets the device scorer be a pure equality test —
    see ops.sw.dna_scorer).  PAD scores a large negative so padded tails
    can never extend alignments.  Defaults (match=2, mismatch=-3) follow
    megablast-style scoring, which is what PEPPAN's blastn stage
    effectively uses (SURVEY.md §2.2).
    """
    m = np.full((6, 6), mismatch, dtype=np.int8)
    np.fill_diagonal(m, match)
    m[DNA_N, DNA_N] = mismatch     # N never matches, not even itself
    m[DNA_PAD, :] = -100
    m[:, DNA_PAD] = -100
    return m


# BLOSUM62 over AA_ALPHA order (ACDEFGHIKLMNPQRSTVWY), standard values.
_BLOSUM62 = """
 4  0 -2 -1 -2  0 -2 -1 -1 -1 -1 -2 -1 -1 -1  1  0  0 -3 -2
 0  9 -3 -4 -2 -3 -3 -1 -3 -1 -1 -3 -3 -3 -3 -1 -1 -1 -2 -2
-2 -3  6  2 -3 -1 -1 -3 -1 -4 -3  1 -1  0 -2  0 -1 -3 -4 -3
-1 -4  2  5 -3 -2  0 -3  1 -3 -2  0 -1  2  0  0 -1 -2 -3 -2
-2 -2 -3 -3  6 -3 -1  0 -3  0  0 -3 -4 -3 -3 -2 -2 -1  1  3
 0 -3 -1 -2 -3  6 -2 -4 -2 -4 -3  0 -2 -2 -2  0 -2 -3 -2 -3
-2 -3 -1  0 -1 -2  8 -3 -1 -3 -2  1 -2  0  0 -1 -2 -3 -2  2
-1 -1 -3 -3  0 -4 -3  4 -3  2  1 -3 -3 -3 -3 -2 -1  3 -3 -1
-1 -3 -1  1 -3 -2 -1 -3  5 -2 -1  0 -1  1  2  0 -1 -2 -3 -2
-1 -1 -4 -3  0 -4 -3  2 -2  4  2 -3 -3 -2 -2 -2 -1  1 -2 -1
-1 -1 -3 -2  0 -3 -2  1 -1  2  5 -2 -2  0 -1 -1 -1  1 -1 -1
-2 -3  1  0 -3  0  1 -3  0 -3 -2  6 -2  0  0  1  0 -3 -4 -2
-1 -3 -1 -1 -4 -2 -2 -3 -1 -3 -2 -2  7 -1 -2 -1 -1 -2 -4 -3
-1 -3  0  2 -3 -2  0 -3  1 -2  0  0 -1  5  1  0 -1 -2 -2 -1
-1 -3 -2  0 -3 -2  0 -3  2 -2 -1  0 -2  1  5 -1 -1 -3 -3 -2
 1 -1  0  0 -2  0 -1 -2  0 -2 -1  1 -1  0 -1  4  1 -2 -3 -2
 0 -1 -1 -1 -2 -2 -2 -1 -1 -1 -1  0 -1 -1 -1  1  5  0 -2 -2
 0 -1 -3 -2 -1 -3 -3  3 -2  1  1 -3 -2 -2 -3 -2  0  4 -3 -1
-3 -2 -4 -3  1 -2 -2 -3 -3 -2 -1 -4 -4 -2 -3 -3 -2 -3 11  2
-2 -2 -3 -2  3 -3  2 -1 -2 -1 -1 -2 -3 -1 -2 -2 -2 -1  2  7
"""


def blosum62_matrix() -> np.ndarray:
    """int8[23,23] BLOSUM62 over our AA token ids (incl. X, STOP, PAD)."""
    core = np.array([[int(v) for v in row.split()] for row in _BLOSUM62.strip().splitlines()],
                    dtype=np.int8)
    assert core.shape == (20, 20)
    m = np.full((23, 23), -4, dtype=np.int8)
    m[:20, :20] = core
    m[AA_X, :20] = -1
    m[:20, AA_X] = -1
    m[AA_X, AA_X] = -1
    m[AA_STOP, :] = -4
    m[:, AA_STOP] = -4
    m[AA_STOP, AA_STOP] = 1
    m[AA_PAD, :] = -100
    m[:, AA_PAD] = -100
    return m
