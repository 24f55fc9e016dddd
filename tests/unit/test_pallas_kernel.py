"""Pallas banded-SW kernel vs the XLA-scan engine (interpret mode on CPU;
the real-TPU comparison runs in bench/dev scripts)."""

import numpy as np
import pytest

from peppan_tpu.ops import sw
from peppan_tpu.ops.kernels import banded_sw as pk
from peppan_tpu.ops.kernels import banded_sw_v2 as pk2


@pytest.mark.parametrize("P,Mq,Mt,B", [(8, 128, 128, 64),
                                       (16, 200, 320, 32)])
def test_pallas_matches_scan(rng, P, Mq, Mt, B):
    q = rng.integers(0, 4, (P, Mq)).astype(np.int8)
    t = rng.integers(0, 4, (P, Mt)).astype(np.int8)
    for i in range(0, P, 2):   # make half the pairs related
        L = min(Mq, Mt)
        t[i, :L] = q[i, :L]
        m = rng.random(L) < 0.1
        t[i, :L][m] = (t[i, :L][m] + 1) % 4
    tp = sw.prep_target_tokens(t)
    ref = np.asarray(sw.sw_banded(q, tp, scorer=sw.dna_scorer(), band=B,
                                  with_stats=False)["score"])
    got = np.asarray(pk.sw_banded_scores_pallas(q, tp, band=B, block_p=8,
                                                interpret=True))
    assert np.array_equal(ref, got)


def test_pallas_rejects_bad_args(rng):
    q = rng.integers(0, 4, (8, 64)).astype(np.int8)
    with pytest.raises(ValueError):
        pk.sw_banded_scores_pallas(q, q, c0=1, interpret=True)
    with pytest.raises(ValueError):
        pk.sw_banded_scores_pallas(q, q, block_p=3, interpret=True)


@pytest.mark.parametrize("P,Mq,Mt,B", [(8, 128, 128, 64),
                                       (16, 200, 320, 32)])
def test_pallas_v2_matches_scan(rng, P, Mq, Mt, B):
    """The register-carry v2 kernel (the production-speed one: measured
    144 vs 80 Gcells/s for the XLA scan on v5e) must stay bit-equal."""
    q = rng.integers(0, 4, (P, Mq)).astype(np.int8)
    t = rng.integers(0, 4, (P, Mt)).astype(np.int8)
    for i in range(0, P, 2):
        L = min(Mq, Mt)
        t[i, :L] = q[i, :L]
        m = rng.random(L) < 0.1
        t[i, :L][m] = (t[i, :L][m] + 1) % 4
    tp = sw.prep_target_tokens(t)
    ref = np.asarray(sw.sw_banded(q, tp, scorer=sw.dna_scorer(), band=B,
                                  with_stats=False)["score"])
    got = np.asarray(pk2.sw_banded_scores_pallas_v2(
        q, tp, band=B, block_p=8, interpret=True))
    assert np.array_equal(ref, got)


def test_pallas_v2_c0_and_chunk(rng):
    q = rng.integers(0, 4, (8, 100)).astype(np.int8)
    t = np.concatenate([rng.integers(0, 4, (8, 64)).astype(np.int8), q],
                       axis=1)
    tp = sw.prep_target_tokens(t)
    ref = np.asarray(sw.sw_banded(q, tp, scorer=sw.dna_scorer(), band=32,
                                  c0=64, with_stats=False)["score"])
    got = np.asarray(pk2.sw_banded_scores_pallas_v2(
        q, tp, band=32, c0=64, block_p=8, chunk=16, interpret=True))
    assert np.array_equal(ref, got)
    with pytest.raises(ValueError):
        pk2.sw_banded_scores_pallas_v2(q, tp, chunk=4, interpret=True)


@pytest.mark.parametrize("P,Mq,Mt,B,c0", [(8, 128, 128, 64, 0),
                                          (16, 200, 320, 32, 0),
                                          (8, 100, 164, 32, 64)])
def test_pallas_v2_stats_matches_scan(rng, P, Mq, Mt, B, c0):
    """Stats-mode v2 kernel: packed (7, P) result bit-equal to
    sw_banded_packed (all seven fields, including tie-broken coords)."""
    q = rng.integers(0, 5, (P, Mq)).astype(np.int8)   # include some N
    t = rng.integers(0, 4, (P, Mt)).astype(np.int8)
    for i in range(0, P, 2):
        L = min(Mq, Mt)
        t[i, :L] = np.where(q[i, :L] == 4, 0, q[i, :L])
        m = rng.random(L) < 0.1
        t[i, :L][m] = (t[i, :L][m] + 1) % 4
    # sprinkle insert/delete to exercise E/F stat propagation
    t[1, 40:44] = (t[1, 40:44] + 2) % 4
    tp = sw.prep_target_tokens(t)
    ref = np.asarray(sw.sw_banded_packed(q, tp, scorer=sw.dna_scorer(),
                                         band=B, c0=c0))
    got = np.asarray(pk2.sw_banded_stats_pallas_v2(
        q, tp, band=B, c0=c0, block_p=8, interpret=True))
    assert np.array_equal(ref, got)


def test_pallas_v2_stats_empty_alignment(rng):
    """All-mismatch pairs must report the empty-alignment sentinel values
    exactly like the scan engine."""
    q = np.zeros((8, 64), np.int8)            # all A
    t = np.full((8, 64), 3, np.int8)          # all T
    tp = sw.prep_target_tokens(t)
    ref = np.asarray(sw.sw_banded_packed(q, tp, scorer=sw.dna_scorer(),
                                         band=32))
    got = np.asarray(pk2.sw_banded_stats_pallas_v2(
        q, tp, band=32, block_p=8, interpret=True))
    assert np.array_equal(ref, got)


@pytest.mark.parametrize("state,token", [("int16", "int32"),
                                         ("int32", "int8"),
                                         ("int16", "int8"),
                                         ("int16", "int16")])
def test_pallas_lab_matches_scan(rng, state, token):
    """Kernel-lab variants (int16 state / int8 tokens / deferred Hmax)
    must stay bit-equal to the scan for every knob combination."""
    from peppan_tpu.ops.kernels import banded_sw_lab as lab

    P, Mq, Mt, B = 8, 200, 320, 32
    q = rng.integers(0, 4, (P, Mq)).astype(np.int8)
    t = rng.integers(0, 4, (P, Mt)).astype(np.int8)
    for i in range(0, P, 2):
        L = min(Mq, Mt)
        t[i, :L] = q[i, :L]
        m = rng.random(L) < 0.1
        t[i, :L][m] = (t[i, :L][m] + 1) % 4
    tp = sw.prep_target_tokens(t)
    ref = np.asarray(sw.sw_banded(q, tp, scorer=sw.dna_scorer(), band=B,
                                  with_stats=False)["score"])
    got = np.asarray(lab.sw_banded_scores_lab(
        q, tp, band=B, block_p=8, state_dtype=state, token_dtype=token,
        defer_hmax=True, interpret=True))
    assert np.array_equal(ref, got)
    got2 = np.asarray(lab.sw_banded_scores_lab(
        q, tp, band=B, block_p=8, state_dtype=state, token_dtype=token,
        interpret=True))
    assert np.array_equal(ref, got2)
    got3 = np.asarray(lab.sw_banded_scores_lab(
        q, tp, band=B, block_p=8, state_dtype=state, token_dtype=token,
        fold_shift=True, defer_hmax=True, interpret=True))
    assert np.array_equal(ref, got3)
    got4 = np.asarray(lab.sw_banded_scores_lab(
        q, tp, band=B, block_p=8, state_dtype=state, token_dtype=token,
        fold_shift=True, derive_ts=True, interpret=True))
    assert np.array_equal(ref, got4)


@pytest.mark.parametrize("Mq,Mt", [(128, 128), (200, 320)])
def test_pallas_lanes_matches_scan(rng, Mq, Mt):
    """Band-on-lanes kernel bit-equality, with INDEL-RICH pairs: the
    round-3 lanes kernel shipped with roll_l(T, -127) in the parity-1 F
    recurrence (reads T[i+1] instead of T[i-1]) which only wrong-scores
    gap-rich inputs — gap-free pairs coincidentally pass (ADVICE.md r3).
    This test inserts/deletes runs so that F-propagation across lanes
    matters."""
    from peppan_tpu.ops.kernels import banded_sw_lab as lab

    P, B = 8, 128
    q = rng.integers(0, 4, (P, Mq)).astype(np.int8)
    t = np.empty((P, Mt), np.int8)
    L = min(Mq, Mt)
    for i in range(P):
        # build t as q with substitutions plus an indel: delete a run
        # from q then pad, so the best path needs a multi-lane gap
        row = q[i, :L].copy()
        m = rng.random(L) < 0.08
        row[m] = (row[m] + 1) % 4
        if i % 2 == 0:
            cut = int(rng.integers(10, 30))
            pos = int(rng.integers(5, L - cut - 5))
            row = np.concatenate([row[:pos], row[pos + cut:],
                                  rng.integers(0, 4, cut).astype(np.int8)])
        t[i, :L] = row[:L]
        if Mt > L:
            t[i, L:] = rng.integers(0, 4, Mt - L).astype(np.int8)
    tp = sw.prep_target_tokens(t)
    ref = np.asarray(sw.sw_banded(q, tp, scorer=sw.dna_scorer(), band=B,
                                  with_stats=False)["score"])
    got = np.asarray(lab.sw_banded_scores_lanes(q, tp, band=B,
                                                interpret=True))
    assert np.array_equal(ref, got)


def test_pallas_lab_int16_guard(rng):
    from peppan_tpu.ops.kernels import banded_sw_lab as lab

    q = rng.integers(0, 4, (8, 17000)).astype(np.int8)
    with pytest.raises(ValueError):
        lab.sw_banded_scores_lab(q, q, state_dtype="int16", block_p=8,
                                 interpret=True)
