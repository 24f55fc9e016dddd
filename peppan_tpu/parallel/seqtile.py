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
