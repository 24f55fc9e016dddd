"""Exhaustive-fallback vs host-oracle golden diff (round-4 verdict #6 loose
end / round-5 directive 6).

The host oracle's iterative best-hit masking is seeding-free BY DESIGN —
the one production path it could not previously vouch for was the opt-in
``--exhaustive_fallback`` windowed sweep (SURVEY §5.7 tier-2, §2.2 blastn
row), because the oracle's masking floor (min_hit_score=26 = one exact
13-mer seed) is exact only for SEEDED mapping.  This diff closes that:

- fixture: barrier-recoded copies (double-base mutations every 12 bp — no
  exact 13-mer survives, identity ~0.8 >> 0.65) of two core genes planted
  DEANNOTATED in two genomes (the exhaustive_bench trick at test scale;
  paralog_families=0 so every unseedable copy makes its (genome, group)
  combo genuinely missing and therefore swept);
- production runs with exhaustive_fallback=True (the sweep MUST fire:
  asserted via the planted regions' presence and exhaustive_combos > 0);
- the oracle runs with min_hit_score=1 (floor plumbed down — the sweep
  can surface hits with no 13-mer run, so 26 would be lossy here);
- decisions diff exactly: cluster partition, group partition, regions
  (coordinates, strand, status) and region grouping.
"""

import os

import numpy as np
import pytest

from peppan_tpu import pipeline
from peppan_tpu.config import PipelineConfig
from peppan_tpu.io import gff
from peppan_tpu.oracle import host
from peppan_tpu.utils import metrics, simulate

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def both(tmp_path_factory):
    rng = np.random.default_rng(5)
    sim = simulate.simulate(n_genomes=4, n_core=6, n_accessory=3,
                            accessory_freq=0.5, mean_gene_codons=80,
                            divergence=0.02, paralog_families=0, seed=42)
    planted = []
    for gnum, fidx in ((1, 0), (3, 2)):
        cname, s, e, _st, gid = sim.features[gnum][fidx]
        contig = sim.contigs[gnum][cname]
        copy = contig[s - 1:e].copy()
        # double-base barriers every 12 bp: no 13-run can match the
        # exemplar (a leak needs the exemplar's own ~2% divergence to hit
        # the same base at BOTH barrier positions — coincidence squared)
        for p in range(0, len(copy) - 1, 12):
            copy[p] = (int(copy[p]) + 1 + int(rng.integers(0, 3))) % 4
            copy[p + 1] = (int(copy[p + 1]) + 1
                           + int(rng.integers(0, 3))) % 4
        sim.contigs[gnum][cname] = np.concatenate(
            [contig[:s - 1], copy, contig[e:]])
        sim.features[gnum] = [f for f in sim.features[gnum] if f[4] != gid]
        planted.append((gnum, s - 1, e - 1))

    d = tmp_path_factory.mktemp("oracle_exhaustive")
    paths = simulate.write_gff(sim, str(d / "gff"))
    cfg = PipelineConfig(prefix="OX", sw_batch=4096, nucl_only=True,
                         paralog_split=False, exhaustive_fallback=True)
    metrics.reset()
    res = pipeline.run(paths, cfg, out_dir=str(d / "out"))
    counters = metrics.snapshot()
    genome_store, gene_store = gff.load_genomes(paths)
    orc = host.run(genome_store, gene_store, min_hit_score=1)
    return res, orc, planted, counters


def test_fallback_fired_and_recovered(both):
    res, _orc, planted, counters = both
    assert counters.get("exhaustive_combos", 0) >= len(planted)
    for (gnum, s0, e0) in planted:
        ov = (np.minimum(res.regions.end, e0)
              - np.maximum(res.regions.start, s0) + 1)
        sel = ((res.regions.genome == gnum)
               & (ov >= 0.5 * (e0 - s0 + 1)))
        assert sel.any(), f"planted unseedable copy not recovered: {gnum}"


def test_cluster_partition_matches(both):
    res, orc, _p, _c = both
    assert np.array_equal(res.clusters.root, orc["root"])
    assert np.array_equal(res.clusters.exemplar_ids, orc["exemplar_ids"])


def test_group_partition_matches(both):
    res, orc, _p, _c = both
    fw, bw = {}, {}
    for a, b in zip(map(int, res.group_of_gene),
                    map(int, orc["group_root"])):
        assert fw.setdefault(a, b) == b, "partition mismatch"
        assert bw.setdefault(b, a) == a, "partition mismatch"


def test_regions_match(both):
    res, orc, _p, _c = both
    r_p, r_o = res.regions, orc["regions"]
    tup_p = sorted(
        (int(r_p.genome[i]), int(r_p.contig[i]), int(r_p.start[i]),
         int(r_p.end[i]), int(r_p.strand[i]), str(r_p.status[i]))
        for i in range(len(r_p)))
    tup_o = sorted(
        (int(r_o.genome[i]), int(r_o.contig[i]), int(r_o.start[i]),
         int(r_o.end[i]), int(r_o.strand[i]), str(r_o.status[i]))
        for i in range(len(r_o)))
    assert tup_p == tup_o


def test_region_grouping_matches(both):
    res, orc, _p, _c = both
    r_p, r_o = res.regions, orc["regions"]

    def keyed(r):
        return {(int(r.genome[i]), int(r.contig[i]), int(r.start[i])):
                int(r.group[i]) for i in range(len(r))}
    kp, ko = keyed(r_p), keyed(r_o)
    assert set(kp) == set(ko)
    fw, bw = {}, {}
    for k in kp:
        a, b = kp[k], ko[k]
        assert fw.setdefault(a, b) == b, "region group partition mismatch"
        assert bw.setdefault(b, a) == a, "region group partition mismatch"
