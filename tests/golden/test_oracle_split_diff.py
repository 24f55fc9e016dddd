"""20-genome pipeline-vs-oracle diff with paralog_split and neighbor_check
ON (round-2 verdict item 4 + weak #6: the 4-genome oracle diff never
exercised the split, the synteny stage, multi-copy loci, or the oracle's
max_hits_per_contig masking loop).

The oracle side re-derives the divergence model from ALL single-copy
cross-genome pairs (full-matrix DP) and splits with the interpreter-loop
NJ (nj_ref) + the same normative edge test, so a decision mismatch here
means the split/tie-break semantics forked — exactly what SURVEY §3.3
flags as the reconciliation crux.
"""

import os

import numpy as np
import pytest

from peppan_tpu import pipeline
from peppan_tpu.config import PipelineConfig
from peppan_tpu.io import gff
from peppan_tpu.oracle import host
from peppan_tpu.utils import simulate

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def both(tmp_path_factory):
    # 2 paralog families at 0.15 ancestral divergence (cross-copy distance
    # ~0.24 >> expectation ~0.025 + 4 sigma): the split decision must be
    # decisive under EITHER side's divergence-model sample — production
    # measures the phase-4 candidate pairs, the oracle all single-copy
    # pairs, and their per-genome-pair medians only converge with enough
    # single-copy families (20 here; at 8 the medians wobbled ~2.4 sigma
    # and the oracle peeled noise leaves production kept)
    sim = simulate.simulate(n_genomes=20, n_core=20, n_accessory=4,
                            accessory_freq=0.4, mean_gene_codons=120,
                            divergence=0.012, paralog_families=2, seed=77)
    d = tmp_path_factory.mktemp("split_diff")
    paths = simulate.write_gff(sim, str(d))
    out = tmp_path_factory.mktemp("split_diff_out")
    cfg = PipelineConfig(prefix="SD", sw_batch=4096, nucl_only=True,
                         paralog_split=True, neighbor_check=True,
                         allowed_sigma=4.0)
    res = pipeline.run(paths, cfg, out_dir=str(out))
    genome_store, gene_store = gff.load_genomes(paths)
    orc = host.run(genome_store, gene_store, paralog_split=True,
                   allowed_sigma=4.0, neighbor_check=True)
    return res, orc, sim, gene_store


def test_split_actually_triggered(both):
    res, orc, sim, gene_store = both
    # each paralog family must live in >1 group on BOTH sides (otherwise
    # this diff would not be exercising the split at all)
    names = gene_store.names
    for fam in ("FAM_0000", "FAM_0001"):
        want = {n for n, f in sim.truth.items() if f.startswith(fam)}
        for labels in (res.group_of_gene, orc["group_root"]):
            grp = {int(labels[i]) for i, n in enumerate(names) if n in want}
            assert len(grp) >= 2, (fam, "split did not trigger")


def test_group_partition_matches_with_split(both):
    res, orc, _sim, _genes = both
    fw, bw = {}, {}
    for a, b in zip(map(int, res.group_of_gene), map(int, orc["group_root"])):
        assert fw.setdefault(a, b) == b, "partition mismatch"
        assert bw.setdefault(b, a) == a, "partition mismatch"


def test_regions_match_with_split_and_synteny(both):
    res, orc, _sim, _genes = both
    r_p, r_o = res.regions, orc["regions"]
    tup_p = sorted(
        (int(r_p.genome[i]), int(r_p.contig[i]), int(r_p.start[i]),
         int(r_p.end[i]), int(r_p.strand[i]))
        for i in range(len(r_p)))
    tup_o = sorted(
        (int(r_o.genome[i]), int(r_o.contig[i]), int(r_o.start[i]),
         int(r_o.end[i]), int(r_o.strand[i]))
        for i in range(len(r_o)))
    assert tup_p == tup_o


def test_region_grouping_matches_with_split(both):
    res, orc, _sim, _genes = both
    r_p, r_o = res.regions, orc["regions"]

    def keyed(r):
        return {(int(r.genome[i]), int(r.contig[i]), int(r.start[i])):
                int(r.group[i]) for i in range(len(r))}
    kp, ko = keyed(r_p), keyed(r_o)
    assert set(kp) == set(ko)
    fw, bw = {}, {}
    for k in sorted(kp):
        a, b = kp[k], ko[k]
        assert fw.setdefault(a, b) == b, ("region group mismatch", k)
        assert bw.setdefault(b, a) == a, ("region group mismatch", k)


def test_truth_recovered(both):
    res, orc, sim, gene_store = both
    # both sides' groups must equal the simulator's family truth (paralog
    # copies are distinct families in truth)
    names = gene_store.names
    for labels in (res.group_of_gene, orc["group_root"]):
        fw, bw = {}, {}
        for i, n in enumerate(names):
            a, b = int(labels[i]), sim.truth[n]
            assert fw.setdefault(a, b) == b, (n, "merged families")
            assert bw.setdefault(b, a) == a, (n, "family split apart")
