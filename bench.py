"""Benchmark entry point — prints ONE JSON line for the driver.

Primary metric (BASELINE.json:2 metric #1): Smith-Waterman cell-updates/s
per chip for the banded wavefront engine, measured on the real device in
score-only mode over a production-shaped batch.

Cell accounting: we report *lane-cell* updates — every (pair, anti-diagonal,
band-lane) DP update the hardware actually performs, P * (Mq+Mt-1) * band
per batch.  This is the honest device-work number (padding included).

vs_baseline: BASELINE.json carries no published reference numbers
("published": {}), so the ratio is anchored to the target in BASELINE.md:
>= 10x a strong multicore CPU MMseqs2-class aligner, taken as 25 GCUPS
(16-core striped-SW ballpark).  vs_baseline = GCUPS / 25.0; the 10x target
is therefore vs_baseline >= 10.
"""

from __future__ import annotations

import json
import time

import numpy as np

CPU_BASELINE_GCUPS = 25.0


def main() -> None:
    from peppan_tpu.utils import jaxinit
    jaxinit.setup_cache()
    import jax

    from peppan_tpu.ops import sw

    rng = np.random.default_rng(0)
    P, M, B = 512, 1024, 128
    q = rng.integers(0, 4, (P, M)).astype(np.int8)
    # targets: mutated copies so alignments are realistic, not degenerate
    t = q.copy()
    mask = rng.random(t.shape) < 0.05
    t[mask] = (t[mask] + 1) % 4

    def run():
        return sw.sw_banded(q, t, scorer=sw.dna_scorer(), band=B,
                            with_stats=False)

    jax.block_until_ready(run())  # compile + warmup
    n_iter = 20
    t0 = time.perf_counter()
    for _ in range(n_iter):
        res = run()
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / n_iter

    lane_cells = P * (2 * M - 1) * B
    gcups = lane_cells / dt / 1e9
    print(json.dumps({
        "metric": "sw_banded_lane_cell_updates_per_s_per_chip",
        "value": round(gcups * 1e9),
        "unit": "cells/s",
        "vs_baseline": round(gcups / CPU_BASELINE_GCUPS, 3),
    }))


if __name__ == "__main__":
    main()
