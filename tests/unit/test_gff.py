import numpy as np

from peppan_tpu.io import alphabet as ab
from peppan_tpu.io import gff
from peppan_tpu.utils import simulate


def test_simulated_roundtrip(sim4):
    sim, paths = sim4
    genome_store, gene_store = gff.load_genomes(paths)
    assert genome_store.n_genomes == 4
    # every simulated feature should survive (simulator emits complete CDS)
    total_feats = sum(len(f) for f in sim.features)
    assert gene_store.n_genes == total_feats
    # spot-check: extracted gene tokens match truth for a minus-strand gene
    for gi in range(4):
        for (cname, s, e, st, gid) in sim.features[gi]:
            k = gene_store.names.index(gid)
            contig = sim.contigs[gi][cname]
            g = contig[s - 1:e]
            if st < 0:
                g = ab.revcomp(g)
            assert np.array_equal(gene_store.gene_tokens(k), g), gid
            break  # one per genome is enough


def test_check_cds():
    good = ab.encode_dna("ATGGCCGCCTAA")
    assert gff.check_cds(good) == ""
    assert gff.check_cds(ab.encode_dna("ATGGCCGCTA")) == "frame"
    assert gff.check_cds(ab.encode_dna("ATGTAAGCCTAA")) == "internal_stop"
    assert gff.check_cds(ab.encode_dna("ATGGCCGCCGCC")) == "no_stop"
    assert gff.check_cds(ab.encode_dna("CCCGCCGCCTAA")) == "no_start"


def test_min_cds_filter(sim4):
    _, paths = sim4
    _, all_genes = gff.load_genomes(paths, min_cds=0)
    _, big_genes = gff.load_genomes(paths, min_cds=10_000)
    assert big_genes.n_genes == 0
    assert all_genes.n_genes > 0


def test_gene_order_deterministic(sim4):
    _, paths = sim4
    _, a = gff.load_genomes(paths)
    _, b = gff.load_genomes(paths)
    assert a.names == b.names
    assert np.array_equal(a.tokens, b.tokens)
