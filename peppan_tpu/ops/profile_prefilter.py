"""MXU k-mer-profile prefilter: candidate pairs as matmul tiles.

The minimizer hash-join (ops.pairs) is seed-exact but host-bound; at pod
scale the O(N^2) candidate discovery should ride the MXU instead
(SURVEY.md §7.0/§7.4: "the genomes x genes similarity matrix materializes
as sharded tiles").  This module estimates pairwise similarity as inner
products of binarized k-mer presence profiles:

  profile[g]  = 0/1 over all 4^k canonical k-mers appearing in gene g
  shared[i,j] = profile[i] . profile[j]   (distinct shared k-mers)

computed as (N, 4^k) x (4^k, N) bf16 matmuls — exactly the shape the MXU
wants — tiled over the ('data', 'db') mesh with the same shard_map layout
as the dense SW tile engine.  A pair is a candidate when the shared count
reaches `min_frac` of the smaller gene's k-mer count; candidates then go
through banded-SW verification like any other pair source.

For two sequences of length L at per-site identity p, the expected shared
k-mer fraction is ~p^k (k=6, p=0.9 -> 0.53; p=0.8 -> 0.26), so thresholds
translate directly from identity floors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..io.tokens import GeneStore


def kmer_profiles(store: GeneStore, ids: np.ndarray, k: int = 6) -> tuple:
    """Binarized canonical k-mer presence profiles (host build, device use).

    Returns (profiles int8[n, 4^k], n_kmers int32[n] = distinct canonical
    k-mers per gene).  Canonical = min(kmer, revcomp) as in the minimizer
    sketch, so strand conventions agree.
    """
    ids = np.asarray(ids)
    dim = 4 ** k
    prof = np.zeros((len(ids), dim), np.int8)
    nk = np.zeros(len(ids), np.int32)
    shift = 2 * (k - 1)
    for row, g in enumerate(ids):
        t = store.gene_tokens(int(g)).astype(np.int64)
        if len(t) < k or (t >= 4).any():
            t = t[t < 4]
            if len(t) < k:
                continue
        # rolling 2-bit pack, fwd and revcomp
        fwd = np.zeros(len(t) - k + 1, np.int64)
        rc = np.zeros(len(t) - k + 1, np.int64)
        for j in range(k):
            fwd = (fwd << 2) | t[j:len(t) - k + 1 + j]
            rc = rc | ((3 - t[j:len(t) - k + 1 + j]) << (2 * j))
        canon = np.minimum(fwd, rc)
        uniq = np.unique(canon)
        prof[row, uniq] = 1
        nk[row] = len(uniq)
    return prof, nk


@functools.partial(jax.jit, static_argnames=("mesh",))
def _shared_counts(prof_q, prof_t, mesh: Mesh | None = None):
    """shared[i, j] = #distinct k-mers in both profiles, bf16 MXU matmul."""
    a = prof_q.astype(jnp.bfloat16)
    b = prof_t.astype(jnp.bfloat16)

    def tile(qa, tb):
        return jnp.dot(qa, tb.T, preferred_element_type=jnp.float32
                       ).astype(jnp.int32)

    if mesh is None:
        return tile(a, b)
    fn = jax.shard_map(tile, mesh=mesh,
                       in_specs=(P("data", None), P("db", None)),
                       out_specs=P("data", "db"))
    return fn(a, b)


def profile_candidates(store: GeneStore, ids: np.ndarray, *, k: int = 6,
                       min_frac: float = 0.3, mesh: Mesh | None = None,
                       tile: int = 2048) -> np.ndarray:
    """Candidate pairs (i < j, global gene ids) whose shared distinct
    k-mer count >= min_frac * min(n_kmers_i, n_kmers_j).

    min_frac ~ identity^k: 0.3 keeps pairs down to ~82%% identity at k=6.
    Runs as (tile x tile) MXU blocks; only the boolean threshold mask is
    fetched per block.
    """
    ids = np.asarray(ids)
    prof, nk = kmer_profiles(store, ids, k)
    n = len(ids)
    if mesh is not None:
        prof_dev = jax.device_put(prof, NamedSharding(mesh, P(None, None)))
    else:
        prof_dev = jax.device_put(prof)

    out_a, out_b = [], []
    for i0 in range(0, n, tile):
        i1 = min(i0 + tile, n)
        for j0 in range(i0, n, tile):
            j1 = min(j0 + tile, n)
            shared = np.asarray(_shared_counts(
                prof_dev[i0:i1], prof_dev[j0:j1], mesh=None))
            floor = np.minimum(nk[i0:i1, None], nk[None, j0:j1])
            mask = shared >= np.maximum(min_frac * floor, 1)
            ai, bj = np.nonzero(mask)
            ai = ai + i0
            bj = bj + j0
            keep = ai < bj
            out_a.append(ai[keep])
            out_b.append(bj[keep])
    if not out_a:
        return np.zeros((0, 2), np.int64)
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    pairs = np.stack([ids[a], ids[b]], axis=1).astype(np.int64)
    order = np.lexsort((pairs[:, 1], pairs[:, 0]))
    return pairs[order]
