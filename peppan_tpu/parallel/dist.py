"""Multi-host bring-up + tile-granular checkpointing for the matrix phase.

SURVEY.md §5.8: multi-host runs bootstrap with jax.distributed (one process
per host, devices federated into one global mesh); all cross-chip traffic
stays in XLA collectives over ICI/DCN.  This environment exposes a single
chip, so `initialize()` is exercised in single-process mode here and on
real pod slices via the standard coordinator env vars.

SURVEY.md §5.4: the all-vs-all similarity matrix is embarrassingly
resumable at (query-block x db-shard) tile granularity.  TileRunner
persists per-tile best-hit reductions (small) plus a completed-tile
manifest, so a preempted multi-hour sweep restarts where it left off —
the in-phase analog of the reference's --continue intermediates.
"""

from __future__ import annotations

import json
import os

import numpy as np


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed bootstrap; no-op for single-process runs.

    On a pod slice, either pass explicit arguments or rely on the TPU
    environment auto-detection (jax.distributed.initialize with none).
    """
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    try:
        if coordinator is None and num_processes is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes, process_id=process_id)
    except (RuntimeError, ValueError):
        # already initialized, or single-process environment
        pass


class TileRunner:
    """Checkpointed sweep over (query-block, db-shard) tiles.

    compute_tile(qlo, qhi, shard) -> dict of small numpy arrays (per-query
    reductions for that tile).  Results merge with elementwise maximum on
    'score' and accompanying argmax payloads.
    """

    def __init__(self, ckpt_dir: str, n_queries: int, q_block: int,
                 n_shards: int):
        self.dir = ckpt_dir
        os.makedirs(ckpt_dir, exist_ok=True)
        self.n_queries = n_queries
        self.q_block = q_block
        self.n_shards = n_shards
        self.manifest_path = os.path.join(ckpt_dir, "tiles.json")
        self.done: set = set()
        if os.path.exists(self.manifest_path):
            self.done = {tuple(x) for x in
                         json.load(open(self.manifest_path))["done"]}

    def tiles(self):
        for qlo in range(0, self.n_queries, self.q_block):
            for shard in range(self.n_shards):
                yield (qlo, min(qlo + self.q_block, self.n_queries), shard)

    def run(self, compute_tile) -> dict:
        best_score = np.zeros(self.n_queries, np.int32)
        best_idx = np.full(self.n_queries, -1, np.int64)
        # reload completed tiles
        for (qlo, qhi, shard) in sorted(self.done):
            path = self._tile_path(qlo, shard)
            if os.path.exists(path):
                with np.load(path) as z:
                    self._merge(best_score, best_idx, qlo, qhi,
                                z["score"], z["idx"])
            else:
                self.done.discard((qlo, qhi, shard))
        for (qlo, qhi, shard) in self.tiles():
            if (qlo, qhi, shard) in self.done:
                continue
            out = compute_tile(qlo, qhi, shard)
            np.savez(self._tile_path(qlo, shard), score=out["score"],
                     idx=out["idx"])
            self._merge(best_score, best_idx, qlo, qhi, out["score"],
                        out["idx"])
            self.done.add((qlo, qhi, shard))
            with open(self.manifest_path, "w") as fh:
                json.dump({"done": sorted(list(t) for t in self.done)}, fh)
        return {"score": best_score, "idx": best_idx}

    def _tile_path(self, qlo, shard):
        return os.path.join(self.dir, f"tile_{qlo}_{shard}.npz")

    @staticmethod
    def _merge(best_score, best_idx, qlo, qhi, score, idx):
        sl = slice(qlo, qhi)
        upd = score > best_score[sl]
        best_score[sl] = np.where(upd, score, best_score[sl])
        best_idx[sl] = np.where(upd, idx, best_idx[sl])
