"""Batched neighbour-joining trees on device — the RapidNJ replacement.

PEPPAN builds one NJ gene tree per candidate ortholog group (subprocess
`rapidnj` + ete3 traversal; reference: PEPPA.py::filt_per_group — mount
empty at build time, role per SURVEY.md §2.2/§3.1 phase 6) and one
pan-genome tree in the parser.  Gene trees are many and small (n <= a few
hundred leaves), so the TPU-native form is a fixed-shape masked O(n^3) NJ
vmapped over groups (SURVEY.md §7.1.5, §7.3.5):

  - all state lives in (2N-1)-slot arrays (leaves 0..N-1, internal nodes
    appended at N..2N-3, root joins the last two);
  - each of the N-2 join steps computes the full Q matrix with masking and
    picks the argmin with a deterministic flat-index tie-break;
  - output is parent pointers + branch lengths — no pointer trees, directly
    traversable with numpy (the ete3 replacement).

Agrees with the canonical NJ formulation (Saitou & Nei 1987, Studier &
Keppler 1988); tested against an independent numpy implementation and on
additive trees (exact recovery).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BIG = np.float32(1e30)


@functools.partial(jax.jit, static_argnames=("n_max",))
def nj_batched(dist: jax.Array, n_leaves: jax.Array, *, n_max: int) -> dict:
    """Neighbour joining over a batch of masked distance matrices.

    dist:     float32[G, n_max, n_max] symmetric, zero diagonal; entries
              beyond n_leaves[g] are ignored.
    n_leaves: int32[G] actual leaf counts (>= 2).
    Returns (all [G, 2*n_max-1]):
      parent: int32  parent slot of each node (-1 for unused/root)
      blen:   float32 branch length to parent
      child_l/child_r: int32 children of internal slots (-1 for leaves)
    Root is slot n_leaves + n_leaves - 2 ... stored per tree in 'root'.
    """
    G, N, _ = dist.shape
    assert N == n_max
    M = 2 * n_max - 1

    def one(dm, n):
        # expanded distance matrix over all M slots
        D = jnp.full((M, M), 0.0, jnp.float32)
        D = D.at[:N, :N].set(dm)
        slot_ids = jnp.arange(M, dtype=jnp.int32)
        active = slot_ids < n
        parent = jnp.full(M, -1, jnp.int32)
        blen = jnp.zeros(M, jnp.float32)
        child_l = jnp.full(M, -1, jnp.int32)
        child_r = jnp.full(M, -1, jnp.int32)

        def join_step(s, state):
            D, active, parent, blen, child_l, child_r = state
            m = jnp.sum(active.astype(jnp.int32))          # active count
            new = n + s                                    # slot of new node
            r = jnp.sum(jnp.where(active[None, :] & active[:, None], D, 0.0),
                        axis=1)
            q = ((m - 2).astype(jnp.float32) * D - r[:, None] - r[None, :])
            pairmask = (active[:, None] & active[None, :]
                        & (slot_ids[:, None] < slot_ids[None, :]))
            q = jnp.where(pairmask, q, BIG)
            flat = jnp.argmin(q.reshape(-1))               # first min: det.
            i = (flat // M).astype(jnp.int32)
            j = (flat % M).astype(jnp.int32)
            dij = D[i, j]
            denom = jnp.maximum((m - 2).astype(jnp.float32), 1.0)
            li = 0.5 * dij + 0.5 * (r[i] - r[j]) / denom
            lj = dij - li
            # 2-leaf remainder: split evenly
            li = jnp.where(m > 2, li, 0.5 * dij)
            lj = jnp.where(m > 2, lj, 0.5 * dij)
            li = jnp.clip(li, 0.0, None)
            lj = jnp.clip(lj, 0.0, None)
            dnew = jnp.where(active, 0.5 * (D[i] + D[j] - dij), 0.0)
            D = D.at[new, :].set(dnew)
            D = D.at[:, new].set(dnew)
            D = D.at[new, new].set(0.0)
            active = active.at[i].set(False).at[j].set(False)
            active = active.at[new].set(s < n - 2)  # root stays inactive
            parent = parent.at[i].set(new).at[j].set(new)
            blen = blen.at[i].set(li).at[j].set(lj)
            child_l = child_l.at[new].set(i)
            child_r = child_r.at[new].set(j)
            return (D, active, parent, blen, child_l, child_r)

        state = (D, active, parent, blen, child_l, child_r)
        state = jax.lax.fori_loop(0, N - 1, lambda s, st: jax.lax.cond(
            s <= n - 2, lambda: join_step(s, st), lambda: st), state)
        _, _, parent, blen, child_l, child_r = state
        return parent, blen, child_l, child_r

    parent, blen, child_l, child_r = jax.vmap(one)(dist, n_leaves)
    root = 2 * n_leaves - 2
    return {"parent": parent, "blen": blen, "child_l": child_l,
            "child_r": child_r, "root": root}


# --- numpy oracle ------------------------------------------------------------

def nj_ref(dm: np.ndarray) -> tuple:
    """Independent numpy NJ. Returns (parent, blen, child_l, child_r, root)
    with the same slot layout and tie-breaks as nj_batched."""
    n = len(dm)
    M = 2 * n - 1
    D = np.zeros((M, M), np.float64)
    D[:n, :n] = dm
    active = [True] * n + [False] * (M - n)
    parent = np.full(M, -1, np.int64)
    blen = np.zeros(M)
    child_l = np.full(M, -1, np.int64)
    child_r = np.full(M, -1, np.int64)
    for s in range(n - 1):
        act = [x for x in range(M) if active[x]]
        m = len(act)
        if m < 2:
            break
        r = {i: sum(D[i, k] for k in act) for i in act}
        best_key, best = None, None
        for ai, i2 in enumerate(act):
            for j2 in act[ai + 1:]:
                qv = (m - 2) * D[i2, j2] - r[i2] - r[j2]
                key = (qv, i2 * M + j2)   # flat-index tie-break = device
                if best_key is None or key < best_key:
                    best_key, best = key, (i2, j2)
        i, j = best
        new = n + s
        dij = D[i, j]
        if m > 2:
            li = 0.5 * dij + 0.5 * (r[i] - r[j]) / (m - 2)
        else:
            li = 0.5 * dij
        lj = dij - li if m > 2 else 0.5 * dij
        li, lj = max(li, 0.0), max(lj, 0.0)
        for k in act:
            if k in (i, j):
                continue
            D[new, k] = D[k, new] = 0.5 * (D[i, k] + D[j, k] - dij)
        active[i] = active[j] = False
        if s < n - 2:
            active[new] = True
        parent[i], parent[j] = new, new
        blen[i], blen[j] = li, lj
        child_l[new], child_r[new] = i, j
    return parent, blen, child_l, child_r, 2 * n - 2


def nj_host(dm: np.ndarray) -> tuple:
    """Vectorized numpy NJ for LARGE matrices — the rapidnj role at
    pan-genome-tree scale (SURVEY §7.3.5: device NJ is for the many small
    gene-family matrices; one 2000-leaf problem wants a host solver, not
    a 2000-step compiled scan).

    Same slot layout and tie-breaks as nj_batched/nj_ref: joined pair =
    min Q, ties to the smallest (slot_i * M + slot_j) with slot_i <
    slot_j.  Works on a compacting working matrix (row j swaps with the
    last row each step), so the total cost is sum of m^2 = O(n^3) numpy
    element ops with no python pair loops: n=2000 runs in seconds where
    the reference oracle (nj_ref, interpreter loops) would take hours.
    """
    n = len(dm)
    M = 2 * n - 1
    parent = np.full(M, -1, np.int64)
    blen = np.zeros(M)
    child_l = np.full(M, -1, np.int64)
    child_r = np.full(M, -1, np.int64)
    if n == 1:
        return parent, blen, child_l, child_r, 0
    W = dm.astype(np.float64).copy()
    ids = np.arange(n)
    r = W.sum(axis=1)
    for s in range(n - 1):
        m = len(W)
        new = n + s
        if m == 2:
            i_id, j_id = int(min(ids)), int(max(ids))
            dij = W[0, 1]
            parent[i_id] = parent[j_id] = new
            blen[i_id] = blen[j_id] = max(0.5 * dij, 0.0)
            child_l[new], child_r[new] = i_id, j_id
            break
        Q = (m - 2) * W - r[:, None] - r[None, :]
        np.fill_diagonal(Q, np.inf)
        qmin = Q.min()
        cand_i, cand_j = np.nonzero(Q == qmin)
        lo = np.minimum(ids[cand_i], ids[cand_j]).astype(np.int64)
        hi = np.maximum(ids[cand_i], ids[cand_j]).astype(np.int64)
        pick = int(np.argmin(lo * M + hi))
        a, b = int(cand_i[pick]), int(cand_j[pick])
        if ids[a] > ids[b]:
            a, b = b, a
        i_id, j_id = int(ids[a]), int(ids[b])
        dij = W[a, b]
        li = 0.5 * dij + 0.5 * (r[a] - r[b]) / (m - 2)
        lj = dij - li
        parent[i_id] = parent[j_id] = new
        blen[i_id] = max(li, 0.0)
        blen[j_id] = max(lj, 0.0)
        child_l[new], child_r[new] = i_id, j_id
        dnew = 0.5 * (W[a] + W[b] - dij)
        dnew[a] = 0.0                   # note dnew[b] is 0 by identity
        # survivors lose their distances to a and b, gain one to the
        # merged node — computed BEFORE row a is overwritten
        r = r - W[:, a] - W[:, b] + dnew
        r[a] = dnew.sum()
        # row a becomes the merged node; row b swaps with the last row
        W[a], W[:, a] = dnew, dnew
        ids[a] = new
        last = m - 1
        if b != last:
            W[b], W[:, b] = W[last], W[:, last].copy()
            W[b, b] = 0.0
            ids[b] = ids[last]
            r[b] = r[last]
        W = W[:last, :last]
        ids = ids[:last]
        r = r[:last]
    return parent, blen, child_l, child_r, 2 * n - 2


def leaves_under(child_l: np.ndarray, child_r: np.ndarray, node: int,
                 n_leaves: int) -> list:
    """Leaf set below a node via an explicit stack (no recursion)."""
    out, stack = [], [int(node)]
    while stack:
        x = stack.pop()
        if x < n_leaves:
            out.append(x)
        else:
            if child_r[x] >= 0:
                stack.append(int(child_r[x]))
            if child_l[x] >= 0:
                stack.append(int(child_l[x]))
    return out


def to_newick(parent, blen, child_l, child_r, root: int, names: list) -> str:
    """Serialize parent-pointer tree to Newick (for PEPPA_parser -t parity)."""

    def rec(x):
        if child_l[x] < 0:
            return f"{names[x]}:{blen[x]:.6f}"
        left = rec(int(child_l[x]))
        right = rec(int(child_r[x]))
        if x == root:
            return f"({left},{right});"
        return f"({left},{right}):{blen[x]:.6f}"

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(10000 + len(parent))
    try:
        return rec(int(root))
    finally:
        sys.setrecursionlimit(old)
