"""Scale-path smoke (SURVEY §4.2.5): a mid-size simulated pan-genome
exercises the code paths that only bite beyond toy size — genome-scaled
seed caps, multi-launch batching, missing-combo protein recovery, group
re-splitting — and checks global invariants the golden fixtures can't
(region/gene accounting, presence-matrix shape, counter sanity).

The real 100/500/2000-genome rungs run on TPU via benchmarks/ladder.py
(BASELINE.md records them); this test keeps the scale MACHINERY covered
in the hermetic CPU suite at a size that stays under a minute.
"""

import numpy as np
import pytest

from peppan_tpu import pipeline
from peppan_tpu.config import PipelineConfig
from peppan_tpu.utils import metrics, simulate

pytestmark = pytest.mark.slow


def test_midsize_pipeline_invariants(tmp_path):
    sim = simulate.simulate(n_genomes=8, n_core=60, n_accessory=30,
                            accessory_freq=0.5, mean_gene_codons=150,
                            divergence=0.02, paralog_families=3, seed=2024)
    paths = simulate.write_gff(sim, str(tmp_path / "gff"))
    metrics.reset()
    res = pipeline.run(paths, PipelineConfig(prefix="SC", sw_batch=1024),
                       out_dir=str(tmp_path / "out"))
    counters = metrics.snapshot()

    n_genes = res.gene_store.n_genes
    r = res.regions
    # every annotated gene should be claimed by some region (complete
    # simulated annotations; duplicates collapse is upstream of regions)
    matched = np.asarray(r.gene_idx)
    matched = matched[matched >= 0]
    assert len(np.unique(matched)) >= 0.98 * n_genes
    # regions >= genes (extra copies allowed), never wildly more
    assert n_genes <= len(r) <= 1.2 * n_genes
    # all regions lie inside their contig
    clen = (res.genome_store.contig_offset[np.asarray(r.contig) + 1]
            - res.genome_store.contig_offset[np.asarray(r.contig)])
    assert np.all(np.asarray(r.start) >= 0)
    assert np.all(np.asarray(r.end) < clen)
    # presence matrix: one row per group, genomes as columns, and the
    # core families present everywhere
    head = open(res.outputs["rtab"]).readline().rstrip("\n").split("\t")
    assert len(head) == 1 + 8
    lines = open(res.outputs["rtab"]).read().splitlines()[1:]
    full_rows = sum(1 for ln in lines
                    if all(c == "1" for c in ln.split("\t")[1:]))
    assert full_rows >= 55          # ~60 core families recovered as core
    # scale machinery actually engaged: multiple SW launches, device
    # cells counted, truth recovered as a partition
    assert counters["sw_launches"] >= 4
    assert counters["sw_lane_cells"] > 0
    truth_of = [sim.truth.get(n) for n in res.gene_store.names]
    fw = {}
    ok = 0
    for lbl, t in zip(res.group_of_gene, truth_of):
        if t is None:
            continue
        if fw.setdefault(int(lbl), t) == t:
            ok += 1
    assert ok >= 0.98 * sum(t is not None for t in truth_of)
