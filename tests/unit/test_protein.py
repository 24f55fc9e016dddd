"""Protein-level (DIAMOND-equivalent) search path tests."""

import numpy as np

from peppan_tpu.io import alphabet as ab
from peppan_tpu.io.tokens import GeneStore
from peppan_tpu.ops import minimizers as mz, protein
from peppan_tpu.utils import simulate


def test_murphy10_reduction_groups():
    red = mz.MURPHY10
    idx = {c: i for i, c in enumerate(ab.AA_ALPHA)}
    # same group survives conservative swaps
    assert red[idx["L"]] == red[idx["V"]] == red[idx["I"]] == red[idx["M"]]
    assert red[idx["K"]] == red[idx["R"]]
    assert red[idx["E"]] == red[idx["D"]]
    # distinct groups stay distinct
    assert red[idx["C"]] != red[idx["A"]]
    assert len({int(red[idx[c]]) for c in ab.AA_ALPHA}) == 10


def test_aa_kmer_invalid_on_stop_and_pad():
    toks = ab.encode_aa("MKLV*AAKLVMKL")
    h = np.asarray(mz.aa_kmer_hashes(toks[None, :], 5))[0]
    # windows overlapping the stop (pos 4) are invalid
    for p in range(0, 5):
        assert h[p] == mz.INVALID_HASH
    assert h[5] != mz.INVALID_HASH


def test_translate_genes_drops_stop(rng):
    g = ab.encode_dna("ATGGCCAAATAA")
    store = GeneStore.from_sequences([g])
    aa = protein.translate_genes(store, np.array([0]))
    assert ab.decode_aa(aa.gene_tokens(0)) == "MAK"


def test_synonymous_homologs_found_by_protein_not_dna(rng):
    """Synonymous recoding keeps AA identity 1.0; DNA identity drops below
    the nucleotide threshold — only the protein pass may connect them."""
    from peppan_tpu.ops import pairs as prs

    base = simulate._random_cds(rng, 250)
    recoded = simulate.synonymous_recode(rng, base)
    unrelated = simulate._random_cds(rng, 250)
    store = GeneStore.from_sequences([base, recoded, unrelated])

    # DNA-level check: identity below 0.65
    hits = prs.verify_pairs(store, np.array([[0, 1]], np.int32))
    assert hits.identity[0] < 0.8  # decayed DNA signal

    edges = protein.protein_similar_pairs(store, np.arange(3),
                                          min_identity=0.9)
    es = {tuple(sorted(e)) for e in edges.tolist()}
    assert (0, 1) in es
    assert (0, 2) not in es and (1, 2) not in es


def test_protein_pass_connects_groups_in_pipeline(tmp_path):
    """End-to-end: a synonymously-recoded family member joins the group
    only when the protein pass is on (--nucl off)."""
    from peppan_tpu.io import gff
    from peppan_tpu import pipeline
    from peppan_tpu.config import PipelineConfig

    rng = np.random.default_rng(77)
    sim = simulate.simulate(n_genomes=3, n_core=6, n_accessory=0,
                            mean_gene_codons=150, divergence=0.01, seed=55)
    # recode family 0's copy in genome 2
    feats = sim.features[2]
    (cname, s, e, st, gid) = feats[0]
    assert sim.truth[gid] == "FAM_0000"
    contig = sim.contigs[2][cname]
    g = contig[s - 1:e]
    if st < 0:
        g = simulate.alphabet.revcomp(g)
    g2 = simulate.synonymous_recode(rng, g)
    placed = g2 if st > 0 else simulate.alphabet.revcomp(g2)
    contig[s - 1:e] = placed

    paths = simulate.write_gff(sim, str(tmp_path / "gff"))
    # synonymous recoding leaves DNA identity ~0.74; run with a stricter
    # nucleotide threshold so only the protein pass can bridge the edge
    res_nucl = pipeline.run(paths, PipelineConfig(
        prefix="NUC", nucl_only=True, match_identity=0.8, sw_batch=4096,
        paralog_split=False), out_dir=str(tmp_path / "o1"))
    res_prot = pipeline.run(paths, PipelineConfig(
        prefix="PRO", nucl_only=False, match_identity=0.8, sw_batch=4096,
        paralog_split=False), out_dir=str(tmp_path / "o2"))

    def fam0_groups(res):
        idxs = [i for i, n in enumerate(res.gene_store.names)
                if sim.truth[n] == "FAM_0000"]
        return {int(res.group_of_gene[i]) for i in idxs}

    assert len(fam0_groups(res_prot)) == 1       # protein pass unifies
    assert len(fam0_groups(res_nucl)) >= 2       # DNA-only cannot