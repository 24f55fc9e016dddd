"""Deterministic union-find (host side).

Used by the linclust-equivalent gene dedup (SURVEY.md §7.1.5) and by
similarity-graph component building.  Roots are always the smallest member
index, independent of union order — so downstream group identities are
stable across edge orderings and shard counts (determinism contract,
SURVEY.md §4.2.3).
"""

from __future__ import annotations

import numpy as np


class UnionFind:
    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)

    def find(self, x: int) -> int:
        p = self.parent
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return int(root)

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # smaller index becomes the root -> canonical representatives
        if ra < rb:
            self.parent[rb] = ra
        else:
            self.parent[ra] = rb

    def roots(self) -> np.ndarray:
        """int64[n]: canonical (smallest-index) root of every element."""
        n = len(self.parent)
        out = np.empty(n, dtype=np.int64)
        for i in range(n):
            out[i] = self.find(i)
        return out


def connected_components(n: int, edges: np.ndarray) -> np.ndarray:
    """Components over n nodes given int edges[m, 2]; returns root per node."""
    uf = UnionFind(n)
    for a, b in np.asarray(edges, dtype=np.int64):
        uf.union(int(a), int(b))
    return uf.roots()
