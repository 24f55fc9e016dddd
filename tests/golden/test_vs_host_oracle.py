"""Pipeline vs host-oracle golden diff (SURVEY.md §7.3.6, VERDICT item 5).

The host oracle (peppan_tpu/oracle/host.py) re-implements phases 3-7 with
no JAX, no seeding heuristics and no banding: all-pairs full-matrix DP.
The production engine's DECISIONS must match it on the committed fixture:
same cluster partition, same group partition, same claimed regions
(coordinates, strand, status), same region grouping.

Both sides run DNA-only with phase-6 splitting off — the oracle's scope
(its exhaustive mapping subsumes the protein stage at this scale; the
split/re-split semantics have their own truth-recovery tests).
"""

import os

import numpy as np
import pytest

from peppan_tpu import pipeline
from peppan_tpu.config import PipelineConfig
from peppan_tpu.io import gff
from peppan_tpu.oracle import host

pytestmark = pytest.mark.slow

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "ref4")


@pytest.fixture(scope="module")
def both(tmp_path_factory):
    gffs = sorted(os.path.join(FIX, "gff", f)
                  for f in os.listdir(os.path.join(FIX, "gff")))
    out = tmp_path_factory.mktemp("oracle_diff")
    cfg = PipelineConfig(prefix="OD", sw_batch=4096, nucl_only=True,
                         paralog_split=False)
    res = pipeline.run(gffs, cfg, out_dir=str(out))
    genome_store, gene_store = gff.load_genomes(gffs)
    orc = host.run(genome_store, gene_store)
    return res, orc


def test_cluster_partition_matches(both):
    res, orc = both
    # both sides use smallest-index union-find roots -> directly equal
    assert np.array_equal(res.clusters.root, orc["root"])
    assert np.array_equal(res.clusters.exemplar_ids, orc["exemplar_ids"])


def test_group_partition_matches(both):
    res, orc = both
    # production relabels roots densely; compare as partitions
    prod = res.group_of_gene
    want = orc["group_root"]
    fw, bw = {}, {}
    for a, b in zip(map(int, prod), map(int, want)):
        assert fw.setdefault(a, b) == b, "partition mismatch"
        assert bw.setdefault(b, a) == a, "partition mismatch"


def test_regions_match(both):
    res, orc = both
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
    res, orc = both
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
