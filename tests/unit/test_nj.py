"""Batched device NJ vs numpy oracle and additive-tree exactness."""

import numpy as np
import jax.numpy as jnp

from peppan_tpu.cluster import nj


def _random_additive_tree_distances(rng, n):
    """Generate leaf distances from a random binary tree (additive metric):
    NJ must recover it exactly (up to branch-length arithmetic)."""
    # build a random topology with random branch lengths via repeated joins
    nodes = list(range(n))
    dist = {i: {} for i in range(n)}
    # leaf-to-all distance bookkeeping via path lengths in constructed tree
    children = {}
    lengths = {}
    nxt = n
    while len(nodes) > 1:
        i = nodes.pop(rng.integers(0, len(nodes)))
        j = nodes.pop(rng.integers(0, len(nodes)))
        li, lj = rng.uniform(0.05, 1.0), rng.uniform(0.05, 1.0)
        children[nxt] = (i, j)
        lengths[(nxt, i)] = li
        lengths[(nxt, j)] = lj
        nodes.append(nxt)
        nxt += 1

    # distances between leaves = sum of branch lengths on path
    root = nodes[0]
    depth = {}

    def walk(x, acc, path):
        if x < n:
            depth[x] = (acc, tuple(path))
            return
        for c in children[x]:
            walk(c, acc + lengths[(x, c)], path + [x])

    walk(root, 0.0, [])
    D = np.zeros((n, n))
    for a in range(n):
        for b in range(a + 1, n):
            pa, pb = depth[a][1], depth[b][1]
            common = 0
            for x, y in zip(pa, pb):
                if x == y:
                    common += 1
                else:
                    break
            # distance = depth_a + depth_b - 2*depth(lca)
            lca_path = pa[:common]
            dl = 0.0
            cur = root
            for nx in lca_path[1:]:
                dl += lengths[(cur, nx)]
                cur = nx
            D[a, b] = D[b, a] = depth[a][0] + depth[b][0] - 2 * dl
    return D


def _tree_dist_matrix(parent, blen, n):
    """Leaf pairwise distances implied by a parent-pointer tree."""
    M = len(parent)
    # path to root for each leaf
    paths = []
    for leaf in range(n):
        p, x, acc = {}, leaf, 0.0
        while x >= 0:
            p[x] = acc
            acc += blen[x]
            x = int(parent[x])
        paths.append(p)
    D = np.zeros((n, n))
    for a in range(n):
        for b in range(a + 1, n):
            common = [x for x in paths[a] if x in paths[b]]
            d = min(paths[a][x] + paths[b][x] for x in common)
            D[a, b] = D[b, a] = d
    return D


def test_nj_matches_oracle_random(rng):
    n_max = 12
    G = 5
    dms = np.zeros((G, n_max, n_max), np.float32)
    ns = np.zeros(G, np.int32)
    for g in range(G):
        n = int(rng.integers(3, n_max + 1))
        a = rng.uniform(0.1, 2.0, size=(n, n))
        dm = (a + a.T) / 2
        # quantize to dyadic rationals so f32 (device) and f64 (oracle)
        # sums are both exact — argmin ties then break identically
        dm = np.round(dm * 16) / 16
        np.fill_diagonal(dm, 0.0)
        dms[g, :n, :n] = dm
        ns[g] = n
    res = nj.nj_batched(jnp.asarray(dms), jnp.asarray(ns), n_max=n_max)
    for g in range(G):
        n = int(ns[g])
        p_ref, b_ref, cl_ref, cr_ref, root_ref = nj.nj_ref(
            dms[g, :n, :n].astype(np.float64))
        p = np.asarray(res["parent"][g])
        b = np.asarray(res["blen"][g])
        # compare topology on the first 2n-1 slots
        M = 2 * n - 1
        # slot numbering differs: device uses slots n..2n-2 in join order,
        # oracle likewise -> directly comparable
        assert np.array_equal(p[:M], p_ref[:M]), g
        np.testing.assert_allclose(b[:M], b_ref[:M], rtol=1e-4, atol=1e-4)
        assert int(res["root"][g]) == root_ref


def test_nj_recovers_additive_tree(rng):
    n = 10
    D = _random_additive_tree_distances(rng, n)
    dm = np.zeros((1, 16, 16), np.float32)
    dm[0, :n, :n] = D
    res = nj.nj_batched(jnp.asarray(dm), jnp.asarray([n], np.int32), n_max=16)
    parent = np.asarray(res["parent"][0])
    blen = np.asarray(res["blen"][0])
    D2 = _tree_dist_matrix(parent, blen, n)
    np.testing.assert_allclose(D2, D, rtol=1e-3, atol=1e-3)


def test_leaves_under_and_newick():
    dm = np.array([[0, 1, 4, 4], [1, 0, 4, 4], [4, 4, 0, 1], [4, 4, 1, 0]],
                  np.float32)
    res = nj.nj_batched(jnp.asarray(dm[None]), jnp.asarray([4], np.int32),
                        n_max=4)
    cl = np.asarray(res["child_l"][0])
    cr = np.asarray(res["child_r"][0])
    root = int(res["root"][0])
    leaves = sorted(nj.leaves_under(cl, cr, root, 4))
    assert leaves == [0, 1, 2, 3]
    # the cherry (0,1) must be a clade
    clades = []
    for x in range(4, 2 * 4 - 1):
        if cl[x] >= 0:
            clades.append(sorted(nj.leaves_under(cl, cr, x, 4)))
    assert [0, 1] in clades or [2, 3] in clades
    nwk = nj.to_newick(np.asarray(res["parent"][0]), np.asarray(res["blen"][0]),
                       cl, cr, root, [f"L{i}" for i in range(4)])
    assert nwk.endswith(";") and "L0" in nwk


def test_nj_host_matches_reference(rng):
    """The vectorized large-n host solver must join the same topology
    with the same branch lengths as the slow reference oracle."""
    for n in (4, 9, 16, 33):
        # dyadic rationals: f64 arithmetic identical between the two
        dm = (rng.integers(1, 64, (n, n)) / 16.0)
        dm = dm + dm.T
        np.fill_diagonal(dm, 0.0)
        ref = nj.nj_ref(dm)
        got = nj.nj_host(dm)
        for a, b, name in zip(ref, got,
                              ("parent", "blen", "cl", "cr", "root")):
            assert np.allclose(a, b), (n, name, a, b)


def test_nj_host_scales(rng):
    """2000-leaf problem (the pan-genome tree size) finishes fast and
    yields a valid additive topology."""
    import time
    n = 1000
    pts = rng.random((n, 3))
    dm = np.linalg.norm(pts[:, None] - pts[None, :], axis=2)
    t0 = time.time()
    parent, blen, cl, cr, root = nj.nj_host(dm)
    assert time.time() - t0 < 30
    # every node except the root has a parent; leaves 0..n-1 all placed
    assert parent[root] == -1
    assert np.all(parent[:n] >= n)
    # tree is a single connected binary structure
    seen = nj.leaves_under(cl, cr, root, n)
    assert len(seen) == n
