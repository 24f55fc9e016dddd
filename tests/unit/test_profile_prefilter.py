"""MXU k-mer-profile prefilter: recall on true homolog pairs, rejection of
unrelated pairs, revcomp invariance."""

import numpy as np

from peppan_tpu.io import alphabet as ab
from peppan_tpu.io.tokens import GeneStore
from peppan_tpu.ops import profile_prefilter as pp


def _mutated(rng, seq, rate):
    out = seq.copy()
    m = rng.random(len(seq)) < rate
    out[m] = (out[m] + rng.integers(1, 4, m.sum())) % 4
    return out


def test_profiles_basic(rng):
    seqs = [rng.integers(0, 4, 300).astype(np.int8) for _ in range(3)]
    store = GeneStore.from_sequences(seqs)
    prof, nk = pp.kmer_profiles(store, np.arange(3), k=5)
    assert prof.shape == (3, 4 ** 5)
    assert (nk > 200).all()
    # revcomp invariance: profile of revcomp equals profile of original
    store2 = GeneStore.from_sequences([seqs[0], ab.revcomp(seqs[0])])
    p2, _ = pp.kmer_profiles(store2, np.arange(2), k=5)
    assert np.array_equal(p2[0], p2[1])


def test_candidates_recall_and_rejection(rng):
    base = [rng.integers(0, 4, 400).astype(np.int8) for _ in range(6)]
    seqs = []
    truth_pairs = set()
    for i, b in enumerate(base):
        seqs.append(b)
    for i, b in enumerate(base):
        seqs.append(_mutated(rng, b, 0.05))     # ~95% identity partner
        truth_pairs.add((i, len(base) + i))
    store = GeneStore.from_sequences(seqs)
    pairs = pp.profile_candidates(store, np.arange(len(seqs)), k=6,
                                  min_frac=0.3)
    got = {tuple(p) for p in pairs.tolist()}
    # all true pairs recovered
    for tp in truth_pairs:
        assert tp in got, tp
    # unrelated random pairs rejected (allow none beyond the 6 true ones)
    assert len(got) == len(truth_pairs)


def test_threshold_tracks_identity():
    rng = np.random.default_rng(99)   # local: boundary case needs a fixed
    b = rng.integers(0, 4, 500).astype(np.int8)
    store = GeneStore.from_sequences(
        [b, _mutated(rng, b, 0.05), _mutated(rng, b, 0.30)])
    # strict threshold keeps the 95% partner, drops the 70% one
    pairs = pp.profile_candidates(store, np.arange(3), k=6, min_frac=0.3)
    got = {tuple(p) for p in pairs.tolist()}
    assert (0, 1) in got
    assert (0, 2) not in got
