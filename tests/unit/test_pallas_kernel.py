"""Pallas banded-SW kernel vs the XLA-scan engine (interpret mode on CPU;
the real-TPU comparison runs in bench/dev scripts)."""

import numpy as np
import pytest

from peppan_tpu.ops import sw
from peppan_tpu.ops.kernels import banded_sw as pk


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
