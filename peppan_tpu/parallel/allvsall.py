"""Sharded all-vs-all similarity tile engine.

The flagship multi-chip component (BASELINE.json north star): the
genes-vs-genes (and genes-vs-genomes) similarity matrix materializes as
(data-batch x db-shard) tiles over the ('data', 'db') mesh.  Each device
aligns its resident query batch against its resident DB rows with the
banded-SW wavefront; per-query best hits merge across the 'db' axis with
XLA collectives.  This subsumes PEPPAN's uberBlast fan-out
(PEPPA.py::get_similar_pairs / ::iter_map_bsn — reference mount empty;
pipeline position per SURVEY.md §3.1 phases 4-5).

Two operating modes:
  dense_tile_scores : every query against every DB row — used by the
      benchmark ladder and small problems (score-only, MXU-free VPU work).
  align_pairs       : sparse candidate pair list (from the minimizer join),
      sharded over the flattened device axis; token stores replicated,
      row gathers local.  The production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import sw


def _cross_pairs(qb: jax.Array, tb: jax.Array) -> tuple:
    """[bq, Wq], [bt, Wt] -> row-major cross product ([bq*bt, Wq], [bq*bt, Wt])."""
    bq, wq = qb.shape
    bt, wt = tb.shape
    qq = jnp.broadcast_to(qb[:, None, :], (bq, bt, wq)).reshape(bq * bt, wq)
    tt = jnp.broadcast_to(tb[None, :, :], (bq, bt, wt)).reshape(bq * bt, wt)
    return qq, tt


def dense_tile_fn(qb: jax.Array, tb: jax.Array, *, band: int,
                  gap_open: int, gap_extend: int) -> jax.Array:
    """Local tile: score every query row against every target row."""
    bq, bt = qb.shape[0], tb.shape[0]
    # target-side N/PAD remap for the equality scorer (once per tile)
    tb = jnp.where(tb == 5, sw.T_PAD, jnp.where(tb == 4, sw.T_N, tb))
    qq, tt = _cross_pairs(qb, tb)
    res = sw.sw_banded(qq, tt, scorer=sw.dna_scorer(), gap_open=gap_open,
                       gap_extend=gap_extend, band=band, with_stats=False)
    return res["score"].reshape(bq, bt)


@functools.partial(jax.jit, static_argnames=("mesh", "band", "gap_open",
                                             "gap_extend"))
def dense_tile_scores(q: jax.Array, t: jax.Array, *, mesh: Mesh,
                      band: int = 128, gap_open: int = 5,
                      gap_extend: int = 2) -> dict:
    """Sharded all-vs-all scores + per-query best hit.

    q: int8[Nq, Wq] sharded P('data', None);  t: int8[Nt, Wt] sharded
    P('db', None).  Returns scores int32[Nq, Nt] (sharded both ways) and the
    per-query best score/DB index (replicated over 'db').
    """
    fn = jax.shard_map(
        functools.partial(dense_tile_fn, band=band, gap_open=gap_open,
                          gap_extend=gap_extend),
        mesh=mesh,
        in_specs=(P("data", None), P("db", None)),
        out_specs=P("data", "db"),
    )
    scores = fn(q, t)
    best = jnp.max(scores, axis=1)
    best_idx = jnp.argmax(scores, axis=1).astype(jnp.int32)
    return {"scores": scores, "best": best, "best_idx": best_idx}


class ShardedPairAligner:
    """Row-sharded sparse pair alignment: pod-memory mode (SURVEY §2.3 TP row).

    The padded token store shards over the 'db' mesh axis — each device's
    HBM holds only ``ceil(n_rows / db)`` rows instead of the whole store,
    which is what makes a 2000-genome store (too large to replicate into
    16 GB HBM) viable on a pod slice.  QUERY tokens stream per launch
    (host-side gather from the host copy of the store, uploaded with the
    index vectors — the DP 'query-gene-batch streaming' axis of SURVEY
    §2.3), so device memory for queries is one in-flight batch.

    Routing: each candidate pair executes on the 'db' column that owns its
    TARGET row (a local gather — no cross-device collective touches token
    data), spread round-robin over the 'data' axis.  Results reassemble on
    host in the original pair order, so downstream decisions are
    byte-identical to the replicated/single-device path (the determinism
    contract; asserted by tests/determinism/test_mesh_pipeline.py).
    """

    def __init__(self, mesh: Mesh, tokens: np.ndarray, *, band: int = 128,
                 gap_open: int = 5, gap_extend: int = 2, batch: int = 4096):
        from ..utils import metrics

        self.mesh = mesh
        self.band = band
        self.dd = int(mesh.shape["data"])
        self.ds = int(mesh.shape["db"])
        n, w = tokens.shape
        self.width = w
        self.rows = -(-n // self.ds)            # rows per 'db' shard
        n_pad = self.rows * self.ds
        if n_pad != n:
            tokens = np.concatenate(
                [tokens, np.full((n_pad - n, w), 5, np.int8)])
        self.host_tokens = tokens
        self.tokens = jax.device_put(
            jnp.asarray(tokens), NamedSharding(mesh, P("db", None)))
        # per-(data,db)-device pair capacity per launch; fixed for shape
        # stability (each distinct shape = one compile)
        self.batch = max(256, batch // (self.dd * self.ds))
        metrics.add("hbm_store_bytes_per_device", self.rows * w)

        flat = P(("data", "db"))
        self._q_sharding = NamedSharding(mesh, P(("data", "db"), None))
        self._i_sharding = NamedSharding(mesh, flat)

        def _local(tok_shard, q, t_local):
            td = jnp.take(tok_shard, t_local, axis=0)
            td = jnp.where(td == 5, sw.T_PAD,
                           jnp.where(td == 4, sw.T_N, td))
            res = sw.sw_banded(q, td, scorer=sw.dna_scorer(),
                               gap_open=gap_open, gap_extend=gap_extend,
                               band=band, with_stats=True)
            return jnp.stack([res[k] for k in sw.STATS_KEYS])

        self._align = jax.jit(jax.shard_map(
            _local, mesh=mesh,
            in_specs=(P("db", None), P(("data", "db"), None),
                      P(("data", "db"))),
            out_specs=P(None, ("data", "db"))))

    def __call__(self, qidx: np.ndarray, tidx: np.ndarray) -> list:
        """Align pairs; returns packed launches [(sel, int32[7, ...])] in
        deterministic order — callers unpack with sw.unpack_stats using the
        sel index map (original pair positions)."""
        from ..utils import metrics

        qidx = np.asarray(qidx, np.int64)
        tidx = np.asarray(tidx, np.int64)
        owner = tidx // self.rows
        n_blocks = self.dd * self.ds
        per = self.batch
        # per-shard queues, original order preserved
        shard_lists = [np.flatnonzero(owner == s) for s in range(self.ds)]
        heads = [0] * self.ds
        out = []
        while any(heads[s] < len(shard_lists[s]) for s in range(self.ds)):
            sel_blocks = []
            qtok = np.full((n_blocks * per, self.width), 5, np.int8)
            tloc = np.zeros(n_blocks * per, np.int32)
            for s in range(self.ds):
                take = shard_lists[s][heads[s]:heads[s] + per * self.dd]
                heads[s] += len(take)
                # round-robin over 'data': element k -> data block k % dd
                for di in range(self.dd):
                    part = take[di::self.dd]
                    base = (di * self.ds + s) * per
                    slots = base + np.arange(len(part))
                    qtok[slots] = self.host_tokens[qidx[part]]
                    tloc[slots] = (tidx[part] - s * self.rows).astype(np.int32)
                    sel_blocks.append((part, slots))
            qd = jax.device_put(jnp.asarray(qtok), self._q_sharding)
            td = jax.device_put(jnp.asarray(tloc), self._i_sharding)
            handle = self._align(self.tokens, qd, td)
            sel = np.concatenate([p for p, _ in sel_blocks])
            slots = np.concatenate([sl for _, sl in sel_blocks])
            out.append((sel, slots, handle))
            metrics.add("sw_pairs", len(sel))
            metrics.add("sw_lane_cells",
                        n_blocks * per * (2 * self.width - 1) * self.band)
            metrics.add("sw_launches", 1)
        return out


class PairAligner:
    """Replicated-store sparse pair alignment over the whole mesh.

    The dense padded token store (one bucket width) is uploaded once,
    replicated; candidate pair index lists are sharded over the flattened
    device axis; each device gathers its rows locally and runs the wavefront.
    """

    def __init__(self, mesh: Mesh, tokens: np.ndarray, *, band: int = 128,
                 gap_open: int = 5, gap_extend: int = 2,
                 with_stats: bool = True):
        self.mesh = mesh
        self.band = band
        self.n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        rep = NamedSharding(mesh, P())
        self.tokens = jax.device_put(jnp.asarray(tokens), rep)
        flat = P(("data", "db"))
        self._sharding = NamedSharding(mesh, flat)

        def _align(tokens, qidx, tidx):
            qd = jnp.take(tokens, qidx, axis=0)
            td = jnp.take(tokens, tidx, axis=0)
            td = jnp.where(td == 5, sw.T_PAD,
                           jnp.where(td == 4, sw.T_N, td))
            return sw.sw_banded(qd, td, scorer=sw.dna_scorer(),
                                gap_open=gap_open, gap_extend=gap_extend,
                                band=band, with_stats=with_stats)

        # shard_map (manual SPMD), matching ShardedPairAligner and
        # ops.pairs._gather_sharded: each device traces the alignment on
        # its local index shard, so the Pallas fast paths see local
        # shapes and never meet GSPMD's partitioner (round-5 review)
        self._align = jax.jit(jax.shard_map(
            _align, mesh=mesh, in_specs=(P(), flat, flat),
            out_specs=flat))

    def __call__(self, qidx: np.ndarray, tidx: np.ndarray) -> dict:
        m = len(qidx)
        pad = (-m) % self.n_dev
        qi = np.concatenate([qidx, np.zeros(pad, qidx.dtype)])
        ti = np.concatenate([tidx, np.zeros(pad, tidx.dtype)])
        qi = jax.device_put(jnp.asarray(qi), self._sharding)
        ti = jax.device_put(jnp.asarray(ti), self._sharding)
        res = self._align(self.tokens, qi, ti)
        return {k: np.asarray(v)[:m] for k, v in res.items()}
