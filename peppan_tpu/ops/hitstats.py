"""Karlin-Altschul hit statistics — the uberBlast bit-score/e-value analog.

PEPPAN's uberBlast stage returns BLAST/DIAMOND tabular rows carrying
bit-scores and e-values alongside raw scores (reference: modules/
uberBlast.py — mount empty at build time; role per SURVEY.md §2.2/§3.2).
The engine here ranks with exact raw SW scores, so these statistics are
PRESENTATION-layer: they normalize scores across scoring schemes and
search-space sizes for the optional hit-table output (PipelineConfig.
save_hits) and for users migrating BLAST-style workflows.

Statistics:
  lambda:    the unique positive root of  sum_ij p_i p_j e^{lambda*s_ij}=1
             (Karlin & Altschul 1990), solved exactly by Newton iteration
             for OUR substitution scores and background frequencies —
             no tabulated magic constants.
  bitscore:  lambda * S / ln 2.  NOTE: the full normalized score is
             (lambda*S - ln K)/ln 2; K (< 1) only shifts every bitscore
             of one scheme by the same constant, so ranking and relative
             e-values are K-independent.  We omit the K offset rather
             than hard-code an unverifiable constant (exact K pending
             reference mount verification).
  evalue:    m * n * e^{-lambda*S} — the K=1 UPPER BOUND on the true
             expect value E = K*m*n*e^{-lambda*S} (K <= 1), i.e. a
             conservative significance estimate.

The ungapped lambda is used for gapped scores, as BLAST does for its
quick score conversions; gapped lambda is strictly smaller, making the
reported e-value bound additionally conservative.
"""

from __future__ import annotations

import functools
import math

import numpy as np


def karlin_lambda(score_matrix: np.ndarray, probs_q: np.ndarray,
                  probs_t: np.ndarray | None = None) -> float:
    """Unique positive root of sum p_i q_j exp(lambda * s_ij) = 1.

    score_matrix: int[A, A] substitution scores with E[s] < 0 and some
    s_ij > 0 (else no positive root exists; raises ValueError).
    """
    if probs_t is None:
        probs_t = probs_q
    p = np.outer(np.asarray(probs_q, float), np.asarray(probs_t, float))
    s = np.asarray(score_matrix, float)
    mean = float((p * s).sum())
    if mean >= 0 or s.max() <= 0:
        raise ValueError(
            f"Karlin-Altschul needs E[s] < 0 < max(s); got mean={mean:.3f}, "
            f"max={s.max():.0f}")

    def f(lam: float) -> float:
        return float((p * np.exp(lam * s)).sum()) - 1.0

    # bracket the root: f(0) = 0 with f'(0) = E[s] < 0, and f -> +inf
    hi = 1.0
    while f(hi) < 0:
        hi *= 2.0
        if hi > 1e3:        # pragma: no cover - pathological matrix
            raise ValueError("lambda bracket failed")
    lo = 0.0
    for _ in range(200):    # bisection: robust, exact to double precision
        mid = 0.5 * (lo + hi)
        if f(mid) < 0:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


@functools.lru_cache(maxsize=16)
def dna_lambda(match: int = 2, mismatch: int = -3) -> float:
    """lambda for the uniform-background DNA equality scorer."""
    s = np.full((4, 4), mismatch, int)
    np.fill_diagonal(s, match)
    return karlin_lambda(s, np.full(4, 0.25))


@functools.lru_cache(maxsize=4)
def blosum62_lambda() -> float:
    """lambda for BLOSUM62 under the Robinson-Robinson AA frequencies."""
    from ..io import alphabet
    m = np.asarray(alphabet.blosum62_matrix(), float)[:20, :20]
    # Robinson & Robinson 1991 frequencies, ordered like AA_ALPHA
    # ("ACDEFGHIKLMNPQRSTVWY")
    freqs = {"A": .07805, "C": .01925, "D": .05364, "E": .06295,
             "F": .03856, "G": .07377, "H": .02199, "I": .05142,
             "K": .05744, "L": .09019, "M": .02243, "N": .04487,
             "P": .05203, "Q": .04264, "R": .05129, "S": .07120,
             "T": .05841, "V": .06441, "W": .01330, "Y": .03216}
    p = np.array([freqs[c] for c in "ACDEFGHIKLMNPQRSTVWY"])
    p = p / p.sum()
    return karlin_lambda(m, p)


def bit_scores(scores: np.ndarray, lam: float) -> np.ndarray:
    """lambda*S/ln2 (K offset omitted; see module docstring)."""
    return np.asarray(scores, float) * (lam / math.log(2.0))


def evalues(scores: np.ndarray, lam: float, query_len: np.ndarray,
            search_space: float) -> np.ndarray:
    """Conservative (K=1) e-value bound: m * n * exp(-lambda * S)."""
    m = np.asarray(query_len, float)
    return m * float(search_space) * np.exp(-lam * np.asarray(scores, float))
