"""Exhaustive-fallback characterization (round-4 verdict directive 8).

100-genome fixture with engineered SEEDED-MISS combos: three core-gene
copies are replaced by versions mutated every 12th base (no exact 13-mer
run -> the minimizer join cannot seed them; identity ~0.92 >> 0.65) and
their annotations removed, so the owning groups go missing in those
genomes for the seeded DNA path.  Runs the pipeline nucl_only twice —
with and without --exhaustive_fallback — and reports wall cost and
recovery, so a user can predict what the flag buys and costs
(SURVEY §5.7 tier-2).

Usage: python benchmarks/exhaustive_bench.py [--json out.json]
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


def main(json_path=None):
    from peppan_tpu import pipeline
    from peppan_tpu.config import PipelineConfig
    from peppan_tpu.utils import metrics, simulate

    rng = np.random.default_rng(7)
    sim = simulate.simulate(n_genomes=100, n_core=200, n_accessory=120,
                            accessory_freq=0.4, mean_gene_codons=300,
                            divergence=0.02, paralog_families=5, seed=1000)
    # seed-less homolog engineering: mutate every 12th base of three
    # different genomes' copies of three different core genes and drop
    # their annotations
    planted = []
    fams = set(sim.truth.values())

    def _pick(gnum, skip):
        """First non-paralog-family feature: a paralog twin's locus keeps
        the group 'present' (the exemplar cross-maps at ~0.8 identity),
        so _missing_combos would never sweep a paralog-family gene."""
        k = 0
        for f in sim.features[gnum]:
            fam = sim.truth[f[4]]
            if "_par" in fam or (fam + "_par1") in fams:
                continue
            if k == skip:
                return f
            k += 1
        raise RuntimeError("no candidate feature")

    for gnum, fidx in ((3, 0), (17, 1), (42, 2)):
        cname, s, e, st, gid = _pick(gnum, fidx)
        contig = sim.contigs[gnum][cname]
        copy = contig[s - 1:e].copy()
        # DOUBLE-base barriers: a single barrier position can leak when
        # the (unknown) exemplar's own ~2% divergence happens to match
        # the mutant base, reopening a 13-run; two adjacent mutated
        # positions make a leak need a coincidence squared (~5e-5/barrier)
        for p in range(0, len(copy) - 1, 12):
            copy[p] = (int(copy[p]) + 1 + int(rng.integers(0, 3))) % 4
            copy[p + 1] = (int(copy[p + 1]) + 1
                           + int(rng.integers(0, 3))) % 4
        sim.contigs[gnum][cname] = np.concatenate(
            [contig[:s - 1], copy, contig[e:]])
        sim.features[gnum] = [f for f in sim.features[gnum] if f[4] != gid]
        planted.append((gnum, s - 1, e - 1, gid))

    d = tempfile.mkdtemp()
    paths = simulate.write_gff(sim, d)
    out = {}
    for flag in (False, True):
        cfg = PipelineConfig(prefix="EX", sw_batch=4096, nucl_only=True,
                             exhaustive_fallback=flag)
        metrics.reset()
        t0 = time.time()
        res = pipeline.run(paths, cfg,
                           out_dir=tempfile.mkdtemp())
        wall = time.time() - t0
        m = metrics.snapshot()
        recovered = 0
        for (gnum, s0, e0, _gid) in planted:
            ov = (np.minimum(res.regions.end, e0)
                  - np.maximum(res.regions.start, s0) + 1)
            sel = ((res.regions.genome == gnum)
                   & (ov >= 0.5 * (e0 - s0 + 1)))
            recovered += int(sel.any())
        out["fallback_on" if flag else "fallback_off"] = {
            "wall_seconds": round(wall, 2),
            "planted_recovered": recovered,
            "exhaustive_cells": int(m.get("exhaustive_cells", 0)),
            "exhaustive_combos": int(m.get("exhaustive_combos", 0)),
            "phase_seconds": {k: round(v, 2) for k, v in
                              res.phase_seconds.items()},
        }
        print(json.dumps(out["fallback_on" if flag else "fallback_off"]),
              flush=True)
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    main(ap.parse_args().json)
