"""Benchmark ladder — the BASELINE.json config ladder on simulated data.

Configs (BASELINE.json:6-12; real datasets are unavailable in this
environment, so SimPan-like simulations stand in at matched scale):
  L0:    4 genomes  (examples-scale, full pipeline)
  L1:   20 genomes  (single-chip all-vs-all + clustering)
  L2:  100 genomes  (sharded-matrix scale; single chip here, the mesh
                     path is validated separately by dryrun_multichip)

Reports per config: phase wall-clocks, total genes, pairs aligned,
DP lane-cell updates and effective GCUPS, and pipeline genes/second.
Usage:  python benchmarks/ladder.py [--configs 4 20 100] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def host_probe_seconds() -> float:
    """~5 s host-health probe: one u64 np.sort of 68M rows.

    The round-5 L4 capture showed whole-session degradation can be
    HOST-side (shared-VM contention): pure-numpy counters ran 3-5x the
    healthy round-4 readings on identical code+data while this probe
    measured 4.6 s vs the healthy ~0.9 s.  Every ladder row records the
    probe so artifact provenance is self-describing; --record runs warn
    loudly when the host is contended (>= 2x reference)."""
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 62, 68_000_000, dtype=np.uint64)
    t0 = time.perf_counter()
    np.sort(x)
    return time.perf_counter() - t0


def run_config(n_genomes: int, *, seed: int = 1000,
               warm: bool = False, resume: bool = False) -> dict:
    from peppan_tpu import pipeline
    from peppan_tpu.config import PipelineConfig
    from peppan_tpu.utils import metrics, simulate

    # scale gene counts with genome count held per-genome realistic-ish
    # (~2000 core-ish genes would be slow to simulate; use 300/genome)
    sim = simulate.simulate(
        n_genomes=n_genomes, n_core=200, n_accessory=120,
        accessory_freq=0.4, mean_gene_codons=300, divergence=0.02,
        paralog_families=5, seed=seed)
    if resume:
        # stall insurance for the big rungs: fixed out_dir + the
        # hash-keyed phase cache, so a tunnel stall costs one phase,
        # not the whole run (simulate is seed-deterministic, so the
        # re-written inputs hash identically).  NOTE: with a warm cache
        # the reported phase times cover only re-executed phases.
        base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            ".ladder_runs")
        tmp = os.path.join(base, f"L{n_genomes}")
        os.makedirs(tmp, exist_ok=True)
    else:
        tmp = tempfile.mkdtemp(prefix=f"ladder{n_genomes}_")
    expect = [os.path.join(tmp, f"{g}.gff") for g in sim.genome_names]
    if resume and all(os.path.exists(p) for p in expect):
        # do NOT rewrite: the phase cache keys on (size, mtime)
        paths = expect
    else:
        paths = simulate.write_gff(sim, tmp)

    if warm:
        # first run pays the (wildly variable) tunnel compile latency;
        # the second measures the engine
        pipeline.run(paths, PipelineConfig(prefix=f"W{n_genomes}"),
                     out_dir=tmp + "_warm")
    metrics.reset()
    t0 = time.time()
    res = pipeline.run(paths, PipelineConfig(prefix=f"L{n_genomes}",
                                             continue_run=resume),
                       out_dir=tmp)
    wall = time.time() - t0
    counters = metrics.snapshot()
    cells = counters.get("sw_lane_cells", 0)
    sw_seconds = (res.phase_seconds.get("cluster", 0)
                  + res.phase_seconds.get("similar_pairs", 0)
                  + res.phase_seconds.get("genome_map", 0))
    pair_seconds = (res.phase_seconds.get("cluster", 0)
                    + res.phase_seconds.get("similar_pairs", 0))
    n_pairs = int(counters.get("sw_pairs", 0)
                  + counters.get("sw_pairs_protein", 0))
    return {
        "config": f"{n_genomes}_genomes",
        "n_genomes": n_genomes,
        "date": time.strftime("%Y-%m-%d"),
        "n_genes": int(res.gene_store.n_genes),
        "n_groups": int(len(np.unique(res.group_of_gene))),
        "n_regions": int(len(res.regions)),
        "wall_seconds": round(wall, 2),
        "phase_seconds": {k: round(v, 2)
                          for k, v in res.phase_seconds.items()},
        "pairs_aligned": n_pairs,
        "pairs_per_second": round(n_pairs / max(pair_seconds, 1e-9), 1),
        "map_windows": int(counters.get("map_windows", 0)),
        "lane_cell_updates": int(cells),
        "gcups_effective": round(cells / max(sw_seconds, 1e-9) / 1e9, 2),
        "genes_per_second": round(res.gene_store.n_genes / wall, 1),
        "counters": {k: (round(v, 2) if isinstance(v, float) else int(v))
                     for k, v in sorted(counters.items())},
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="*", type=int, default=[4, 20])
    ap.add_argument("--json", default=None)
    ap.add_argument("--warm", action="store_true",
                    help="run each config twice, report the warm run")
    ap.add_argument("--resume", action="store_true",
                    help="fixed out_dir + phase cache: a crash/stall "
                         "resumes at the failed phase (big configs)")
    ap.add_argument("--record", action="store_true",
                    help="stamp rows as the authoritative record: "
                         "bench.py's extras prefer record rows over any "
                         "date ordering.  Use ONLY for runs from a "
                         "session whose health was verified (paired "
                         "kernel slopes in the normal band, no "
                         "concurrent host work)")
    ap.add_argument("--degraded", action="store_true",
                    help="stamp rows as degraded-session data: bench.py "
                         "ignores them whenever any other artifact "
                         "covers the config")
    args = ap.parse_args()

    from peppan_tpu.utils import jaxinit
    jaxinit.setup_cache()

    out = []
    for n in args.configs:
        # re-probe before EVERY rung: contention arriving mid-ladder
        # (hours at the big rungs) must show in that rung's provenance
        probe = round(host_probe_seconds(), 2)
        if args.record and probe >= 1.8:
            print(f"WARNING: host probe {probe} s (healthy ~0.9 s) — "
                  "this host is contended; a --record run captured now "
                  "will likely NOT beat the standing record", flush=True)
        print(f"=== config: {n} genomes ===", flush=True)
        r = run_config(n, warm=args.warm, resume=args.resume)
        r["host_probe_s"] = probe
        if args.record:
            r["record"] = True
        if args.degraded:
            r["degraded_session"] = True
        out.append(r)
        print(json.dumps(r, indent=1), flush=True)
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
