"""PEPPA_parser-equivalent outputs: matrix, tree, core alignment, curve,
driven through the CLI (the real user surface)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from peppan_tpu import pipeline
from peppan_tpu.config import PipelineConfig
from peppan_tpu.postprocess import parser as post
from peppan_tpu.utils import simulate


@pytest.fixture(scope="module")
def pan_run(tmp_path_factory):
    sim = simulate.simulate(n_genomes=5, n_core=10, n_accessory=6,
                            accessory_freq=0.5, mean_gene_codons=120,
                            divergence=0.02, seed=17)
    out = tmp_path_factory.mktemp("post_sim")
    paths = simulate.write_gff(sim, str(out))
    res = pipeline.run(paths, PipelineConfig(prefix="PP", sw_batch=4096),
                       out_dir=str(out))
    return sim, paths, res


def test_read_pan_gff_roundtrip(pan_run):
    sim, paths, res = pan_run
    pan = post.read_pan_gff(res.outputs["gff"])
    assert pan.genomes == sim.genome_names
    assert len(pan.records) == len(res.regions)
    # counts match the written Rtab
    lines = open(res.outputs["rtab"]).read().splitlines()[1:]
    assert len(lines) == len(pan.groups)


def test_pan_tree_newick(pan_run, tmp_path):
    _, paths, res = pan_run
    pan = post.read_pan_gff(res.outputs["gff"])
    nwk = post.pan_tree(pan, str(tmp_path / "t.nwk"))
    assert nwk.endswith(";")
    for name in pan.genomes:
        assert name in nwk


def test_core_alignment_and_snps(pan_run, tmp_path):
    sim, paths, res = pan_run
    pan = post.read_pan_gff(res.outputs["gff"])
    fa = str(tmp_path / "core.fasta")
    snp = str(tmp_path / "core.snps")
    ncore, nsnp = post.core_alignment(pan, paths, fa, snp, core_frac=0.95)
    assert ncore >= 8   # most of the 10 core families qualify
    # alignment rows all equal length, one per genome
    seqs = {}
    name = None
    for line in open(fa):
        if line.startswith(">"):
            name = line[1:].strip()
            seqs[name] = ""
        else:
            seqs[name] += line.strip()
    assert set(seqs) == set(sim.genome_names)
    lens = {len(s) for s in seqs.values()}
    assert len(lens) == 1 and lens.pop() > 0
    # ~2% divergence -> plenty of SNP columns
    assert nsnp > 50


def test_rarefaction_curve(pan_run, tmp_path):
    _, _, res = pan_run
    pan = post.read_pan_gff(res.outputs["gff"])
    path = str(tmp_path / "curve.tsv")
    post.rarefaction(pan, path, n_perm=20)
    all_lines = open(path).read().splitlines()
    assert any(ln.startswith("# heaps_law") for ln in all_lines)
    lines = [ln for ln in all_lines if not ln.startswith("#")]
    assert len(lines) == len(pan.genomes) + 1
    pan_means = [float(ln.split("\t")[1]) for ln in lines[1:]]
    core_means = [float(ln.split("\t")[3]) for ln in lines[1:]]
    assert pan_means == sorted(pan_means)            # pan grows
    assert core_means == sorted(core_means, reverse=True)  # core shrinks


def test_cli_end_to_end(pan_run, tmp_path):
    """Drive the real CLI surface: pan + parse subcommands."""
    sim, paths, _ = pan_run
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "peppan_tpu", "pan", "-p", "CLI",
         "-o", str(tmp_path), *paths],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    gffp = str(tmp_path / "CLI.PEPPAN.gff")
    assert os.path.exists(gffp)
    out2 = subprocess.run(
        [sys.executable, "-m", "peppan_tpu", "parse", "-g", gffp,
         "-p", str(tmp_path / "CLIP"), "-m", "-t", "-c",
         "-a", "95", "--input_gffs", *paths],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert out2.returncode == 0, out2.stderr[-2000:]
    for suffix in (".gene_content.Rtab", ".tree.nwk", ".rarefaction.tsv",
                   ".core.aln.fasta", ".core.snps.tsv"):
        assert os.path.exists(str(tmp_path / ("CLIP" + suffix))), suffix


def test_cli_selftest(tmp_path):
    """The bundled-examples self check (reference --testunit analog)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-m", "peppan_tpu", "selftest",
         "-o", str(tmp_path)],
        capture_output=True, text=True, env=env, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-1500:]
    assert "PASS" in out.stdout


def test_core_alignment_preserves_insertions(tmp_path):
    """Center-star semantics (round-4 verdict missing #5): an allele's
    in-frame insertion relative to the center allele must SURVIVE as
    alignment columns (the old projection dropped it), with gap columns
    in every other genome at that block."""
    from peppan_tpu.io import alphabet

    sim = simulate.simulate(n_genomes=4, n_core=8, n_accessory=0,
                            mean_gene_codons=120, divergence=0.01,
                            seed=91)
    # insert a distinctive in-frame 9-mer into genome 1's copy of one
    # core gene (strand +1 copies only, to keep the edit simple)
    motif = alphabet.encode_dna("ACGTTGCAA")
    target = None
    for (c, s, e, st, gid) in sim.features[1]:
        if st > 0:
            target = (c, s, e, st, gid)
            break
    assert target is not None
    c, s, e, st, gid = target
    contig = sim.contigs[1][c]
    at = s - 1 + 3 * (((e - s + 1) // 2) // 3)     # codon boundary
    sim.contigs[1][c] = np.concatenate(
        [contig[:at], motif, contig[at:]])
    sim.features[1] = [
        (c2, s2 if s2 <= at else s2 + 9,
         (e2 + 9 if (c2 == c and s2 <= at < e2) else
          (e2 if e2 <= at else e2 + 9)), st2, g2)
        for (c2, s2, e2, st2, g2) in sim.features[1]]
    paths = simulate.write_gff(sim, str(tmp_path / "gff"))
    res = pipeline.run(paths, PipelineConfig(prefix="CI", sw_batch=4096),
                       out_dir=str(tmp_path / "out"))
    pan = post.read_pan_gff(res.outputs["gff"])
    fa = str(tmp_path / "core.fasta")
    snp = str(tmp_path / "core.snps")
    ncore, _ = post.core_alignment(pan, paths, fa, snp, core_frac=0.95)
    assert ncore >= 6
    seqs = {}
    name = None
    for line in open(fa):
        if line.startswith(">"):
            name = line[1:].strip()
            seqs[name] = ""
        else:
            seqs[name] += line.strip()
    widths = {len(v) for v in seqs.values()}
    assert len(widths) == 1
    ins_row = seqs[sim.genome_names[1]]
    pos = ins_row.find("ACGTTGCAA")
    assert pos >= 0, "inserted bases were dropped from the alignment"
    for gname, row in seqs.items():
        if gname != sim.genome_names[1]:
            assert "-" in row[pos:pos + 9], (gname, row[pos:pos + 9])
