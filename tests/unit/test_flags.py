"""Flag-surface round-trip tests (SURVEY.md §5.6): --incompleteCDS letter
codes, --untrusted exemplar demotion, --match_len / --match_frag_prop."""

import argparse

import numpy as np

from peppan_tpu import cli, pipeline
from peppan_tpu.cluster import linclust
from peppan_tpu.config import PipelineConfig
from peppan_tpu.io import alphabet as ab, gff
from peppan_tpu.io.tokens import GeneStore
from peppan_tpu.ops import pairs as prs
from peppan_tpu.utils import simulate


def _write_gff(tmp_path, name, genes):
    """genes: list of (gene_id, tokens). One contig, 100bp spacers."""
    parts, feats = [], []
    pos = 1
    rng = np.random.default_rng(5)
    for gid, toks in genes:
        spacer = rng.integers(0, 4, size=100).astype(np.int8)
        parts.append(spacer)
        pos += 100
        parts.append(toks)
        feats.append((pos, pos + len(toks) - 1, gid))
        pos += len(toks)
    contig = np.concatenate(parts)
    path = tmp_path / f"{name}.gff"
    with open(path, "w") as fh:
        fh.write("##gff-version 3\n")
        fh.write(f"##sequence-region {name}_c1 1 {len(contig)}\n")
        for (s, e, gid) in feats:
            fh.write(f"{name}_c1\tt\tCDS\t{s}\t{e}\t.\t+\t0\tID={gid}\n")
        fh.write("##FASTA\n")
        fh.write(f">{name}_c1\n{ab.decode_dna(contig)}\n")
    return str(path)


def test_incomplete_cds_letter_codes(tmp_path, rng):
    ok = simulate._random_cds(rng, 80)
    bad = simulate._random_cds(rng, 80)
    bad[123:126] = [3, 0, 0]                      # internal TAA at codon 41
    noend = simulate._random_cds(rng, 80)[:-3]    # stop codon removed -> 'e'
    noend = np.concatenate([noend, simulate._random_cds(rng, 20)[3:6]])
    assert gff.check_cds(bad) == "internal_stop"
    p = _write_gff(tmp_path, "G0", [("ok", ok), ("istop", bad)])

    _, gs = gff.load_genomes([p], incomplete_cds=False)
    assert gs.names == ["ok"]
    _, gs = gff.load_genomes([p], incomplete_cds="i")
    assert gs.names == ["ok", "istop"]
    _, gs = gff.load_genomes([p], incomplete_cds="sef")   # i not allowed
    assert gs.names == ["ok"]
    _, gs = gff.load_genomes([p], incomplete_cds=True)
    assert gs.names == ["ok", "istop"]


def test_untrusted_demotes_exemplars(tmp_path, rng):
    """Identical gene in two genomes: the exemplar normally comes from the
    first; --untrusted flips it to the trusted genome."""
    g = simulate._random_cds(rng, 100)
    p0 = _write_gff(tmp_path, "A", [("gA", g)])
    p1 = _write_gff(tmp_path, "B", [("gB", g.copy())])
    cfg = PipelineConfig(prefix="U1", sw_batch=256, paralog_split=False)
    res = pipeline.run([p0, p1], cfg, out_dir=str(tmp_path / "o1"))
    ex = int(res.clusters.exemplar_ids[0])
    assert res.gene_store.names[ex] == "gA"
    cfg2 = PipelineConfig(prefix="U2", sw_batch=256, paralog_split=False,
                          untrusted=("A",))
    res2 = pipeline.run([p0, p1], cfg2, out_dir=str(tmp_path / "o2"))
    ex2 = int(res2.clusters.exemplar_ids[0])
    assert res2.gene_store.names[ex2] == "gB"


def test_match_len_or_path(rng):
    """Two genes sharing a 500bp block out of 1200: coverage fails
    --match_prop 0.5 but --match_len 400 connects them."""
    shared = rng.integers(0, 4, size=500).astype(np.int8)
    # shared prefix keeps the alignment on diagonal 0 (inside the band);
    # long distinct tails push max coverage to ~0.45 < match_prop
    a = np.concatenate([shared, rng.integers(0, 4, 700).astype(np.int8)])
    b = np.concatenate([shared, rng.integers(0, 4, 600).astype(np.int8)])
    store = GeneStore.from_sequences([a, b], genome=[0, 1])
    clusters = linclust.ClusterResult(
        root=np.arange(2, dtype=np.int64),
        exemplar=np.arange(2, dtype=np.int64),
        exemplar_ids=np.arange(2, dtype=np.int64),
        hits=prs.PairHits(*(np.zeros((0, 2), np.int32),) + tuple(
            np.zeros(0, t) for t in (np.int32, np.float32, np.float32,
                                     np.float32, np.int32, np.int32))))
    cfg = PipelineConfig(nucl_only=True, sw_batch=256)
    root = pipeline._similarity_groups(store, clusters, cfg)
    assert root[0] != root[1]
    cfg2 = PipelineConfig(nucl_only=True, sw_batch=256, match_len=400)
    root2 = pipeline._similarity_groups(store, clusters, cfg2)
    assert root2[0] == root2[1]


def test_cli_flag_parsing():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd")
    cli._pan_parser(sub)
    args = ap.parse_args(["pan", "x.gff", "--incompleteCDS", "ie",
                          "--match_len", "400", "--match_frag_prop", "0.2",
                          "--untrusted", "G1", "G2"])
    assert args.incompleteCDS == "ie"
    assert args.match_len == 400
    assert args.match_frag_prop == 0.2
    assert args.untrusted == ["G1", "G2"]
    args2 = ap.parse_args(["pan", "x.gff", "--incompleteCDS"])
    assert args2.incompleteCDS is True
    args3 = ap.parse_args(["pan", "x.gff"])
    assert args3.incompleteCDS is False


def test_external_genes_flag(tmp_path):
    """--genes/-g: curated reference genes join the pool as pseudo-genome
    members, OUTRANK annotations for exemplar choice, and never appear as
    regions or presence-matrix columns."""
    sim = simulate.simulate(n_genomes=3, n_core=8, n_accessory=3, seed=55)
    paths = simulate.write_gff(sim, str(tmp_path / "gff"))
    # external FASTA = an exact copy of one annotated gene, renamed
    genomes, genes = gff.load_genomes(paths)
    seq = ab.decode_dna(genes.gene_tokens(0))
    ext = tmp_path / "refs.fna"
    ext.write_text(f">CURATED_REF\n{seq}\n")

    res = pipeline.run(paths, PipelineConfig(prefix="EXT",
                                             genes=(str(ext),)),
                       out_dir=str(tmp_path / "out"))
    names = res.gene_store.names
    assert "CURATED_REF" in names
    ridx = names.index("CURATED_REF")
    # exemplar of its cluster IS the external gene (rank -1 beats all)
    assert int(res.clusters.exemplar[0]) == ridx
    assert int(res.clusters.exemplar[ridx]) == ridx
    # same group as the annotated copies; regions only on real genomes
    assert res.group_of_gene[ridx] == res.group_of_gene[0]
    assert np.all(np.asarray(res.regions.genome) < genomes.n_genomes)
    # presence matrix columns = real genomes only
    head = open(res.outputs["rtab"]).readline().rstrip("\n").split("\t")
    assert len(head) == 1 + genomes.n_genomes

    # determinism + truth: groups still match the no-external run as a
    # partition restricted to annotated genes
    res0 = pipeline.run(paths, PipelineConfig(prefix="EXT0"),
                        out_dir=str(tmp_path / "out0"))
    a = res.group_of_gene[:res0.gene_store.n_genes]
    b = res0.group_of_gene
    fw = {}
    for x, y in zip(map(int, a), map(int, b)):
        assert fw.setdefault(x, y) == y
