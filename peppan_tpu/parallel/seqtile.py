"""Cross-device sequence tiling — the SP/CP analog for long targets.

SURVEY.md §5.7: a whole chromosome (~5 Mbp) is too long for one banded DP;
the reference leans on blastn's internal seeding.  Here the long target is
split into overlapping windows sharded over the 'db' mesh axis; each
device aligns the query batch against its resident windows with the
wavefront kernel, and per-query best scores reduce across the axis.

Halo discipline replaces ppermute state exchange: adjacent windows overlap
by (query_width + band) bases, so every alignment whose span fits the
query is fully contained in at least one window — the per-window maxima
are exact, no boundary reconciliation needed.  (A banded alignment of a
query of length Lq spans at most Lq + band target bases: each of the <= Lq
query rows consumes one target base and the band bounds the total gap
excess.)  This is the moral equivalent of ring-attention blockwise
processing with the communication traded for recompute on the halo.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..io import alphabet
from ..ops import sw


def window_long_target(target: np.ndarray, query_width: int,
                       band: int) -> np.ndarray:
    """Split a long token sequence into windows for an EXHAUSTIVE banded
    sweep (no seeding).

    Two constraints shape the windows:
      - containment: an alignment starting at target offset c inside a
        window spans at most query_width + band columns, so the window
        must extend that far past the last admitted start;
      - band coverage: the c0=0 band only explores start offsets
        c in (-band, band], so consecutive windows may be at most `band`
        apart for every target position to fall inside some window's band.
    Hence stride = band, width = query_width + 2 * band.  Total DP cells
    are O(L * query_width) — the honest cost of exhaustive (blastn-grade
    sensitivity) search; the seeded path in ops.genome_map avoids it.
    Returns int8[n_windows, width] target-convention tokens.
    """
    L = len(target)
    width = query_width + 2 * band
    stride = band
    starts = list(range(0, max(L - band, 1), stride))
    out = np.full((len(starts), width), sw.T_PAD, dtype=np.int8)
    for i, s in enumerate(starts):
        seg = target[s:s + width]
        out[i, :len(seg)] = seg
    out[out == alphabet.DNA_PAD] = sw.T_PAD
    out[out == alphabet.DNA_N] = sw.T_N
    return out


def _cross(qb, tb):
    nq, wq = qb.shape
    bt, wt = tb.shape
    qq = jnp.broadcast_to(qb[:, None, :], (nq, bt, wq)).reshape(-1, wq)
    tt = jnp.broadcast_to(tb[None, :, :], (nq, bt, wt)).reshape(-1, wt)
    return qq, tt


@functools.lru_cache(maxsize=None)
def _chunk_single_fn(band: int, gap_open: int, gap_extend: int):
    """jit-cached (max, first-argmax) window scorer, single device."""

    @jax.jit
    def f(qb, tb):
        nq = qb.shape[0]
        qq, tt = _cross(qb, tb)
        res = sw.sw_banded(qq, tt, scorer=sw.dna_scorer(),
                           gap_open=gap_open, gap_extend=gap_extend,
                           band=band, with_stats=False)
        s = res["score"].reshape(nq, tb.shape[0])
        return jnp.max(s, axis=1), jnp.argmax(s, axis=1)

    return f


@functools.lru_cache(maxsize=None)
def _chunk_mesh_fn(mesh: Mesh, band: int, gap_open: int, gap_extend: int):
    """Sharded (max, first-argmax): local reduce, then pmax/pmin over the
    flattened ('data','db') axis — ties resolve to the globally smallest
    window index exactly like the single-device argmax.  Indices ride
    int32 on device (jax x64 is disabled): fine, chunk sizes are
    bounded by `batch` and block count by the device count."""
    big = np.int32(np.iinfo(np.int32).max)

    def local(qb, tb):
        nq, bt = qb.shape[0], tb.shape[0]
        qq, tt = _cross(qb, tb)
        res = sw.sw_banded(qq, tt, scorer=sw.dna_scorer(),
                           gap_open=gap_open, gap_extend=gap_extend,
                           band=band, with_stats=False)
        s = res["score"].reshape(nq, bt)
        lmax = jnp.max(s, axis=1)
        larg = jnp.argmax(s, axis=1)
        blk = (jax.lax.axis_index("data") * mesh.shape["db"]
               + jax.lax.axis_index("db"))
        gidx = blk.astype(jnp.int32) * bt + larg.astype(jnp.int32)
        gmax = jax.lax.pmax(jax.lax.pmax(lmax, "db"), "data")
        cand = jnp.where(lmax == gmax, gidx, big)
        gfirst = jax.lax.pmin(jax.lax.pmin(cand, "db"), "data")
        return gmax, gfirst

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, None), P(("data", "db"), None)),
        out_specs=(P(None), P(None))))


def best_windows(q: np.ndarray, wins: np.ndarray, *, band: int = 128,
                 gap_open: int = 5, gap_extend: int = 2,
                 batch: int = 4096, mesh: Mesh | None = None) -> tuple:
    """Per-query (best score, FIRST best window index) over prepared
    target-convention windows.

    The position-bearing variant of sweep_scores: callers that need the
    winning placement (the exhaustive genome-map fallback) get the window
    to run a stats pass on.  Ties resolve to the smallest window index
    (determinism contract).  With a mesh, each window chunk shards over
    the flattened ('data','db') axis and the (max, first-argmax) reduce
    across devices with pmax/pmin collectives; the single-device path is
    the same computation without the collectives.  Returns
    (int32[Nq], int64[Nq]); window index -1 where every score is <= 0.
    """
    nq = q.shape[0]
    n_dev = 1
    if mesh is not None:
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    per = max(1, batch // max(nq, 1))
    per = -(-per // n_dev) * n_dev            # chunk size, multiple of n_dev

    chunk_single = _chunk_single_fn(band, gap_open, gap_extend)
    chunk_mesh = (_chunk_mesh_fn(mesh, band, gap_open, gap_extend)
                  if mesh is not None else None)

    best = np.zeros(nq, np.int64)
    best_w = np.full(nq, -1, np.int64)
    for c0 in range(0, len(wins), per):
        cw = wins[c0:c0 + per]
        pad = (-len(cw)) % (per if mesh is not None else 1)
        if mesh is not None:
            # fixed chunk shape: one compile, clean n_dev split
            pad = per - len(cw) if len(cw) < per else 0
        if pad:
            cw = np.concatenate(
                [cw, np.full((pad, cw.shape[1]), sw.T_PAD, np.int8)])
        if mesh is not None:
            qd = jax.device_put(q, NamedSharding(mesh, P(None, None)))
            td = jax.device_put(cw, NamedSharding(
                mesh, P(("data", "db"), None)))
            s, wixs = chunk_mesh(qd, td)
        else:
            s, wixs = chunk_single(q, jnp.asarray(cw))
        s = np.asarray(s, np.int64)
        wixs = np.asarray(wixs, np.int64) + c0
        upd = s > best
        best_w = np.where(upd, wixs, best_w)
        best = np.where(upd, s, best)
    best_w[best <= 0] = -1
    return best.astype(np.int32), best_w


def sweep_scores(q: np.ndarray, target: np.ndarray, mesh: Mesh, *,
                 band: int = 128, gap_open: int = 5,
                 gap_extend: int = 2) -> np.ndarray:
    """Best local score of every query against an arbitrarily long target,
    computed as sharded window tiles with max-reduction over 'db'.

    q: int8[Nq, Wq] query-convention tokens; target: int8[L] raw tokens.
    Returns int32[Nq].
    """
    n_db = mesh.shape["db"]
    wins = window_long_target(target, q.shape[1], band)
    # pad window count to a multiple of the db axis
    pad = (-len(wins)) % n_db
    if pad:
        wins = np.concatenate(
            [wins, np.full((pad, wins.shape[1]), sw.T_PAD, np.int8)])

    @functools.partial(jax.jit, static_argnames=())
    def tile(qb, tb):
        bq, bt = qb.shape[0], tb.shape[0]
        qq = jnp.broadcast_to(qb[:, None, :],
                              (bq, bt, qb.shape[1])).reshape(bq * bt, -1)
        tt = jnp.broadcast_to(tb[None, :, :],
                              (bq, bt, tb.shape[1])).reshape(bq * bt, -1)
        res = sw.sw_banded(qq, tt, scorer=sw.dna_scorer(), gap_open=gap_open,
                           gap_extend=gap_extend, band=band,
                           with_stats=False)
        local = jnp.max(res["score"].reshape(bq, bt), axis=1)
        # ICI collective: merge per-shard maxima across the 'db' axis
        return jax.lax.pmax(local, "db")

    fn = jax.shard_map(tile, mesh=mesh,
                       in_specs=(P(None, None), P("db", None)),
                       out_specs=P(None))
    qd = jax.device_put(q, NamedSharding(mesh, P(None, None)))
    td = jax.device_put(wins, NamedSharding(mesh, P("db", None)))
    return np.asarray(fn(qd, td))
