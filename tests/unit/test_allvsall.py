"""Sharded tile engine tests on the virtual 8-device CPU mesh
(SURVEY.md §4.2.4)."""

import numpy as np
import jax

from peppan_tpu.io import alphabet as ab
from peppan_tpu.ops import sw
from peppan_tpu.parallel import allvsall, mesh as meshmod


def _pad(seqs, width):
    out = np.full((len(seqs), width), ab.DNA_PAD, dtype=np.int8)
    for i, s in enumerate(seqs):
        out[i, :len(s)] = s[:width]
    return out


def test_mesh_factoring():
    m = meshmod.make_mesh()
    assert m.shape["data"] * m.shape["db"] == len(jax.devices())
    m2 = meshmod.make_mesh(data=4, db=2)
    assert m2.shape == {"data": 4, "db": 2}


def test_dense_tile_matches_single_device(rng):
    m = meshmod.make_mesh(data=4, db=2)
    nq, nt, w = 8, 16, 128
    qs = [rng.integers(0, 4, rng.integers(60, 120)).astype(np.int8)
          for _ in range(nq)]
    ts = [rng.integers(0, 4, rng.integers(60, 120)).astype(np.int8)
          for _ in range(nt)]
    # make some targets related to queries so scores are nontrivial
    for i in range(0, nt, 3):
        ts[i] = qs[i % nq].copy()
    q = _pad(qs, w)
    t = _pad(ts, w)
    res = allvsall.dense_tile_scores(
        jax.device_put(q, meshmod.data_sharded(m)),
        jax.device_put(t, meshmod.db_sharded(m)), mesh=m, band=64)
    scores = np.asarray(res["scores"])
    # oracle: pairwise single-device kernel
    for i in range(nq):
        qq = np.broadcast_to(q[i], (nt, w))
        ref = sw.sw_banded(qq, sw.prep_target_tokens(t),
                           scorer=sw.dna_scorer(), band=64,
                           with_stats=False)
        assert np.array_equal(scores[i], np.asarray(ref["score"])), i
    assert np.array_equal(np.asarray(res["best"]), scores.max(axis=1))
    assert np.array_equal(np.asarray(res["best_idx"]), scores.argmax(axis=1))


def test_pair_aligner_matches_direct(rng):
    m = meshmod.make_mesh()
    n, w = 32, 128
    seqs = [rng.integers(0, 4, rng.integers(80, 120)).astype(np.int8)
            for _ in range(n)]
    tokens = _pad(seqs, w)
    qidx = rng.integers(0, n, size=13).astype(np.int32)
    tidx = rng.integers(0, n, size=13).astype(np.int32)
    aligner = allvsall.PairAligner(m, tokens, band=64)
    res = aligner(qidx, tidx)
    ref = sw.sw_banded(tokens[qidx], sw.prep_target_tokens(tokens[tidx]),
                       scorer=sw.dna_scorer(), band=64, with_stats=True)
    for k in res:
        assert np.array_equal(res[k], np.asarray(ref[k])), k
