"""Sequence-tiling sweep tests (8-dev CPU mesh)."""

import numpy as np

from peppan_tpu.io import alphabet as ab
from peppan_tpu.ops import sw
from peppan_tpu.parallel import mesh as meshmod, seqtile


def test_window_geometry(rng):
    """stride = band, width = wq + 2*band: every target position has a
    window placing it within the c0=0 band with full containment."""
    target = rng.integers(0, 4, 40_000).astype(np.int8)
    wq, band = 256, 64
    wins = seqtile.window_long_target(target, wq, band)
    assert wins.shape[1] == wq + 2 * band
    n_expected = len(range(0, len(target) - band, band))
    assert wins.shape[0] == n_expected


def test_sweep_matches_full_alignment(rng):
    m = meshmod.make_mesh(data=2, db=4)
    target = rng.integers(0, 4, 30_000).astype(np.int8)
    # plant two queries at known positions (one revcomp-irrelevant, fwd)
    q1 = target[5_000:5_400].copy()
    q2 = target[22_000:22_300].copy()
    mut = rng.random(300) < 0.05
    q2[mut] = (q2[mut] + 1) % 4
    q3 = rng.integers(0, 4, 350).astype(np.int8)  # unrelated
    wq = 512
    q = np.full((3, wq), ab.DNA_PAD, np.int8)
    for i, s in enumerate((q1, q2, q3)):
        q[i, :len(s)] = s
    got = seqtile.sweep_scores(q, target, m, band=64)
    # planted exact copy: full-score alignment must be recovered even
    # though its position (5000) is far outside any single c0=0 band
    assert got[0] == 2 * len(q1)
    # mutated copy: high but sub-perfect score
    assert 2 * 300 * 0.75 < got[1] < 2 * 300
    # unrelated query scores low
    assert got[2] < 100


def test_best_windows_mesh_matches_single(rng):
    """Mesh (pmax/pmin collectives) and single-device best_windows agree
    on both score and FIRST-winning-window index, across chunk sizes."""
    target = rng.integers(0, 4, 20_000).astype(np.int8)
    q1 = target[3_000:3_300].copy()
    q2 = target[15_000:15_280].copy()
    wq = 512
    q = np.full((2, wq), ab.DNA_PAD, np.int8)
    q[0, :len(q1)] = q1
    q[1, :len(q2)] = q2
    wins = seqtile.window_long_target(target, wq, band=64)
    s0, w0 = seqtile.best_windows(q, wins, band=64, batch=512)
    m = meshmod.make_mesh(data=2, db=4)
    s1, w1 = seqtile.best_windows(q, wins, band=64, batch=512, mesh=m)
    assert np.array_equal(s0, s1)
    assert np.array_equal(w0, w1)
    # winning window must contain the plant site
    for row, pos in ((0, 3_000), (1, 15_000)):
        ws = int(w0[row]) * 64
        assert ws <= pos < ws + wins.shape[1]


