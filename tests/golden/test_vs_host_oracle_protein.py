"""Pipeline vs host-oracle golden diff for the PROTEIN rail (round-4
verdict missing #1): the DIAMOND-analog stack (Murphy-10 seeding, two-hit
rule, cross-frame clustering, frameshift stitch, AA identity floors) gets
its independent second implementation diffed here — oracle/host.py's
all-pairs BLOSUM62 similarity edges and naive 6-frame translated search
(no seeding, no banding) vs the production engine with nucl_only=False.

Fixture engineering (why decisions are decisive):
  - homolog-A: an ANNOTATED recoded copy of one core family inserted in
    genome 1 — amino acids swapped within Murphy-10 groups (reduced
    alphabet unchanged, so production seeding cannot miss it) plus full
    synonymous codon randomization, leaving DNA identity far below
    match_identity but AA identity far above protein_identity.  Only the
    protein SIMILARITY edge can join it to its family.
  - homolog-B: genome 2's copy of another core family is REPLACED by the
    same kind of recoding plus a 1-nt deletion and its annotation is
    removed: DNA mapping misses it, the group goes missing in genome 2,
    and only the 6-frame protein MAP with cross-frame stitching recovers
    the locus — as two frame fragments merged into one region whose
    traceback calls the frameshift (status pseudogene).
"""

import os

import numpy as np
import pytest

from peppan_tpu import pipeline
from peppan_tpu.config import PipelineConfig
from peppan_tpu.io import alphabet, gff
from peppan_tpu.oracle import host
from peppan_tpu.utils import simulate

pytestmark = pytest.mark.slow

# AA token swaps inside one Murphy-10 group (ops.minimizers.MURPHY10):
# the reduced k-mers — and therefore production's seeds — are unchanged
_AA = alphabet.AA_ALPHA
_SWAP = {"L": "V", "V": "L", "I": "M", "M": "I", "E": "D", "D": "E",
         "N": "Q", "Q": "N", "K": "R", "R": "K", "S": "T", "T": "S",
         "F": "Y", "Y": "F"}
_SWAP_TOK = np.arange(20, dtype=np.int8)
for _a, _b in _SWAP.items():
    _SWAP_TOK[_AA.index(_a)] = _AA.index(_b)


def _recode(dna: np.ndarray, rng, swap_rate=0.5) -> np.ndarray:
    """Recoded CDS: middle amino acids swapped within Murphy groups at
    swap_rate, every middle codon re-drawn among the (possibly swapped)
    AA's synonymous codons.  Start and stop codons are preserved."""
    code = alphabet.genetic_code_table()
    codons_of = {}
    for c in range(64):
        codons_of.setdefault(int(code[c]), []).append(c)
    n = (len(dna) // 3) * 3
    out = dna[:n].copy().reshape(-1, 3)
    for i in range(1, len(out) - 1):
        cid = 16 * int(out[i, 0]) + 4 * int(out[i, 1]) + int(out[i, 2])
        aa = int(code[cid])
        if aa >= 20:
            continue
        if rng.random() < swap_rate:
            aa = int(_SWAP_TOK[aa])
        c2 = codons_of[aa][int(rng.integers(0, len(codons_of[aa])))]
        out[i] = (c2 // 16, (c2 // 4) % 4, c2 % 4)
    return out.ravel()


@pytest.fixture(scope="module")
def both(tmp_path_factory):
    rng = np.random.default_rng(4021)
    sim = simulate.simulate(n_genomes=10, n_core=12, n_accessory=2,
                            accessory_freq=0.5, mean_gene_codons=100,
                            divergence=0.01, seed=4021)

    # homolog-A: annotated recoded copy of core family 0's genome-1 gene,
    # appended (with its own feature) at the end of genome 1's contig
    cA, sA, eA, stA, gidA = sim.features[1][0]
    geneA = sim.contigs[1][cA][sA - 1:eA]
    if stA < 0:
        geneA = alphabet.revcomp(geneA)
    recA = _recode(geneA, rng)
    spacer = rng.integers(0, 4, 83).astype(np.int8)
    base = len(sim.contigs[1][cA])
    sim.contigs[1][cA] = np.concatenate([sim.contigs[1][cA], spacer, recA])
    sim.features[1].append((cA, base + len(spacer) + 1,
                            base + len(spacer) + len(recA), 1,
                            "HOMOLOG_A"))
    sim.truth["HOMOLOG_A"] = sim.truth[gidA]

    # homolog-B: REPLACE genome 2's copy of core family 1 with a recoded
    # + 1-nt-deleted version and drop its annotation
    cB, sB, eB, stB, gidB = sim.features[2][1]
    geneB = sim.contigs[2][cB][sB - 1:eB]
    if stB < 0:
        geneB = alphabet.revcomp(geneB)
    recB = _recode(geneB, rng)
    cut = len(recB) // 2
    recB = np.concatenate([recB[:cut], recB[cut + 1:]])   # frameshift
    if stB < 0:
        recB = alphabet.revcomp(recB)
    contig = sim.contigs[2][cB]
    sim.contigs[2][cB] = np.concatenate(
        [contig[:sB - 1], recB, contig[eB:]])
    shift = (eB - sB + 1) - len(recB)
    sim.features[2] = [
        (c, s if s <= sB else s - shift, e if e <= sB else e - shift,
         st, g) for (c, s, e, st, g) in sim.features[2] if g != gidB]

    d = tmp_path_factory.mktemp("prot_diff")
    paths = simulate.write_gff(sim, str(d))
    out = tmp_path_factory.mktemp("prot_diff_out")
    cfg = PipelineConfig(prefix="PD", sw_batch=4096, nucl_only=False,
                         paralog_split=False)
    res = pipeline.run(paths, cfg, out_dir=str(out))
    genome_store, gene_store = gff.load_genomes(paths)
    orc = host.run(genome_store, gene_store, nucl_only=False)
    return res, orc, sim, gene_store, (sB, eB, gidB, gidA)


def test_cluster_partition_matches(both):
    res, orc, _sim, _genes, _meta = both
    assert np.array_equal(res.clusters.root, orc["root"])
    assert np.array_equal(res.clusters.exemplar_ids, orc["exemplar_ids"])


def test_group_partition_matches_and_protein_edge_fired(both):
    res, orc, sim, genes, meta = both
    prod, want = res.group_of_gene, orc["group_root"]
    fw, bw = {}, {}
    for a, b in zip(map(int, prod), map(int, want)):
        assert fw.setdefault(a, b) == b, "partition mismatch"
        assert bw.setdefault(b, a) == a, "partition mismatch"
    # homolog-A joined its family through the PROTEIN edge on both sides
    _sB, _eB, _gidB, gidA = meta
    names = genes.names
    ia = names.index("HOMOLOG_A")
    fam = sim.truth[gidA]
    mates = [i for i, n in enumerate(names)
             if n != "HOMOLOG_A" and sim.truth.get(n) == fam]
    assert mates
    assert int(prod[ia]) == int(prod[mates[0]])
    assert int(want[ia]) == int(want[mates[0]])
    # ...and the DNA pass could NOT have made the edge: its alignment
    # fails identity-AND-coverage (similarity-phase keep rule)
    a_toks = genes.gene_tokens(ia)
    m_toks = genes.gene_tokens(mates[0])
    stats, _ = host._align(a_toks, m_toks)
    ident = stats["matches"] / max(stats["aln_len"], 1)
    qcov = (stats["qend"] - stats["qstart"] + 1) / len(a_toks)
    tcov = (stats["tend"] - stats["tstart"] + 1) / len(m_toks)
    assert not (ident >= 0.65 and max(qcov, tcov) >= 0.5)


def test_regions_match_including_protein_recovery(both):
    res, orc, _sim, _genes, meta = both
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
    # the frameshifted homolog-B locus exists as a pseudogene region in
    # genome 2 on BOTH sides (protein-map recovery + frameshift call)
    sB, eB, _gidB, _gidA = meta
    for tup in (tup_p, tup_o):
        cover = [t for t in tup if t[0] == 2
                 and t[2] < eB and t[3] > sB - 1
                 and t[5] == "pseudogene"]
        assert cover, "protein-recovered frameshift region missing"


def test_region_grouping_matches(both):
    res, orc, _sim, _genes, _meta = both
    r_p, r_o = res.regions, orc["regions"]

    def keyed(r):
        return {(int(r.genome[i]), int(r.contig[i]), int(r.start[i])):
                int(r.group[i]) for i in range(len(r))}
    kp, ko = keyed(r_p), keyed(r_o)
    assert set(kp) == set(ko)
    fw, bw = {}, {}
    for k in kp:
        assert fw.setdefault(kp[k], ko[k]) == ko[k]
        assert bw.setdefault(ko[k], kp[k]) == kp[k]
