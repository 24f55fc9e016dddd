"""Assignment-loop re-split test — the reference's re-triggered
filt_per_group (SURVEY.md §3.3).

Scenario the gene-level phase-6 splitter CANNOT see: every genome carries
an unannotated diverged paralog locus (a decayed duplicate / mobile-element
cargo).  The annotated genes are single-copy per genome, so phase 6 never
flags the group — but genome mapping finds both loci, and single-pass
greedy assignment swallows them into one ortholog group.  The re-split
hook must separate the diverged loci into their own group using the NJ +
divergence test over the LOCUS sequences.
"""

import numpy as np
import pytest

from peppan_tpu import pipeline
from peppan_tpu.config import PipelineConfig
from peppan_tpu.utils import simulate


@pytest.fixture(scope="module")
def sim_with_shadow(tmp_path_factory):
    """4 genomes; family 0 gets an unannotated ~13%-diverged shadow copy
    appended to every contig.  Returns (paths, shadow_spans) where
    shadow_spans[genome] = (start0, end0) 0-based inclusive."""
    rng = np.random.default_rng(11)
    sim = simulate.simulate(n_genomes=4, n_core=8, n_accessory=0,
                            divergence=0.01, seed=7)
    # donor: genome 0's annotated copy of FAM_0000
    feats0 = sim.features[0]
    cname0, s0, e0, st0, _gid0 = feats0[0]
    tokens0 = sim.contigs[0][cname0]
    donor = tokens0[s0 - 1:e0]
    if st0 < 0:
        from peppan_tpu.io import alphabet
        donor = alphabet.revcomp(donor)
    shadow_anc = simulate._mutate(rng, donor, 0.13)
    shadow_spans = {}
    for gi in range(4):
        cname = list(sim.contigs[gi])[0]
        toks = sim.contigs[gi][cname]
        copy = simulate._mutate(rng, shadow_anc, 0.01)
        spacer = rng.integers(0, 4, size=120).astype(np.int8)
        start0 = len(toks) + len(spacer)
        sim.contigs[gi][cname] = np.concatenate([toks, spacer, copy])
        shadow_spans[gi] = (start0, start0 + len(copy) - 1)
    d = tmp_path_factory.mktemp("resplit_sim")
    paths = simulate.write_gff(sim, str(d))
    return sim, paths, shadow_spans


def _shadow_vs_annotated_groups(res, shadow_spans):
    """(set of groups claiming shadow loci, set claiming FAM_0000 genes)."""
    regions = res.regions
    shadow_groups, gene_groups = set(), set()
    for i in range(len(regions)):
        gm = int(regions.genome[i])
        s, e = int(regions.start[i]), int(regions.end[i])
        ss, se = shadow_spans[gm]
        inter = min(e, se) - max(s, ss) + 1
        if inter > 0.5 * (se - ss + 1):
            shadow_groups.add(int(regions.group[i]))
        gi = int(regions.gene_idx[i])
        if gi >= 0 and res.gene_store.names[gi].endswith("_00000"):
            gene_groups.add(int(regions.group[i]))
    return shadow_groups, gene_groups


def test_single_pass_misgroups(sim_with_shadow, tmp_path_factory):
    """Without the re-split hook the shadow loci are absorbed into the
    annotated family's group — the failure mode the loop exists to fix."""
    _sim, paths, shadow_spans = sim_with_shadow
    out = tmp_path_factory.mktemp("nosplit")
    cfg = PipelineConfig(prefix="NOSPLIT", sw_batch=4096,
                         paralog_split=False)
    res = pipeline.run(paths, cfg, out_dir=str(out))
    shadow_groups, gene_groups = _shadow_vs_annotated_groups(
        res, shadow_spans)
    assert shadow_groups, "shadow loci were not even mapped"
    assert shadow_groups & gene_groups, (
        "single-pass greedy no longer mis-groups; update this scenario "
        "to keep the re-split test meaningful")


def test_resplit_recovers_truth(sim_with_shadow, tmp_path_factory):
    _sim, paths, shadow_spans = sim_with_shadow
    out = tmp_path_factory.mktemp("resplit")
    cfg = PipelineConfig(prefix="RESPLIT", sw_batch=4096,
                         paralog_split=True)
    res = pipeline.run(paths, cfg, out_dir=str(out))
    shadow_groups, gene_groups = _shadow_vs_annotated_groups(
        res, shadow_spans)
    assert shadow_groups, "shadow loci were not mapped"
    assert not (shadow_groups & gene_groups), (
        f"re-split failed: shadow loci share groups {shadow_groups} with "
        f"annotated FAM_0000 genes {gene_groups}")
    # fresh labels must be named (no None holes reachable from regions)
    for g in shadow_groups:
        assert res.group_names[g] is not None
        assert res.group_names[g].endswith("_r")


def test_resplit_deterministic(sim_with_shadow, tmp_path_factory):
    _sim, paths, _spans = sim_with_shadow
    cfg = PipelineConfig(prefix="RDET", sw_batch=4096, paralog_split=True)
    outs = []
    for tag in ("a", "b"):
        out = tmp_path_factory.mktemp(f"rdet_{tag}")
        r = pipeline.run(paths, cfg, out_dir=str(out))
        outs.append(r)
    for key in outs[0].outputs:
        a = open(outs[0].outputs[key], "rb").read()
        b = open(outs[1].outputs[key], "rb").read()
        assert a == b, f"output {key} differs between runs"
