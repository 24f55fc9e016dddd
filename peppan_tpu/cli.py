"""Command-line interface — PEPPA / PEPPA_parser flag-compatible.

Reference entry points (SURVEY.md §1 L5, §5.6; mount empty at build time):
  PEPPA -p out -t 8 examples/*.gff          -> `peppan-tpu pan`
  PEPPA_parser -g out.PEPPAN.gff -p OUT -m  -> `peppan-tpu parse`

Flag names follow the reference so published command lines keep working;
TPU-only knobs (band, kmer, mesh) are additions.  ``--n_thread`` is
accepted for compatibility and ignored (parallelism is the device mesh,
not host threads).
"""

from __future__ import annotations

import argparse
import logging
import sys


def _pan_parser(sub):
    p = sub.add_parser("pan", help="reconstruct a pan-genome from GFF3s")
    p.add_argument("gffs", nargs="+", help="one GFF3(+FASTA) per genome")
    p.add_argument("-p", "--prefix", default="PEPPAN_TPU")
    p.add_argument("-o", "--out_dir", default=".")
    p.add_argument("-t", "--n_thread", type=int, default=None,
                   help="accepted for PEPPA compatibility; ignored")
    p.add_argument("-g", "--genes", nargs="*", default=[],
                   help="FASTA files of curated reference genes to add "
                        "to the pool (outrank all annotations)")
    p.add_argument("-P", "--priority", nargs="*", default=[],
                   help="genome names whose annotations are trusted first")
    p.add_argument("--untrusted", nargs="*", default=[],
                   help="genome names whose annotations rank last for "
                        "exemplar choice")
    p.add_argument("--min_cds", type=int, default=120)
    p.add_argument("--incompleteCDS", nargs="?", const=True, default=False,
                   metavar="CODES",
                   help="keep incomplete CDS; bare flag keeps all, or give "
                        "letter codes: s=no start, e=no stop, i=internal "
                        "stop, f=frame")
    p.add_argument("--gtable", type=int, default=11)
    p.add_argument("--clust_identity", type=float, default=0.9)
    p.add_argument("--clust_match_prop", type=float, default=0.9)
    p.add_argument("--match_identity", type=float, default=0.65)
    p.add_argument("--match_prop", type=float, default=0.5)
    p.add_argument("--match_len", type=int, default=0,
                   help="similarity edges also pass at >= this aligned bp "
                        "even below --match_prop (0 = off)")
    p.add_argument("--match_frag_len", type=int, default=50)
    p.add_argument("--match_frag_prop", type=float, default=0.0,
                   help="min fragment span as a fraction of the exemplar")
    p.add_argument("--xdrop_floor", type=int, default=34,
                   help="ungapped pre-extension floor before banded DP "
                        "(blastn analog; 0 disables)")
    p.add_argument("--aa_xdrop_floor", type=int, default=0,
                   help="ungapped BLOSUM62 pre-extension floor for protein "
                        "candidate windows (diamond analog; 0 = off, the "
                        "default — Murphy-10 seeds can score 0, so any "
                        "positive floor trades sensitivity for speed)")
    p.add_argument("--exhaustive_fallback", action="store_true",
                   help="blastn-grade windowed sweep for (genome, group) "
                        "combos with zero seeded candidates (slow, exact)")
    p.add_argument("--candidate_source", choices=["minimizer", "profile"],
                   default="minimizer",
                   help="phase-4 candidate discovery: minimizer hash-join "
                        "or MXU k-mer-profile matmul tiles")
    p.add_argument("--nucl", action="store_true",
                   help="nucleotide-only mode (skip protein-level search)")
    p.add_argument("--save_hits", action="store_true",
                   help="also write <prefix>.map.tsv — the per-genome hit "
                        "table (uberBlast .bsn analog) with bitscore and "
                        "conservative e-value columns")
    p.add_argument("--allowed_sigma", type=float, default=3.0)
    p.add_argument("--noNeighborCheck", action="store_true")
    p.add_argument("--synteny_gap", type=int, default=300)
    p.add_argument("--synteny_diff", type=float, default=1.2)
    p.add_argument("--pseudogene", type=float, default=0.8)
    p.add_argument("--noParalogSplit", action="store_true")
    p.add_argument("--continue", dest="continue_run", action="store_true")
    # TPU-native knobs
    p.add_argument("--band", type=int, default=128)
    p.add_argument("--kmer", type=int, default=13)
    p.add_argument("--window", type=int, default=8)
    # default matches PipelineConfig.sw_batch: every test and ladder run
    # uses 4096-row launches, and a smaller CLI default silently costs 8x
    # more tunnel round-trips (round-2 review finding)
    p.add_argument("--sw_batch", type=int, default=4096)
    p.add_argument("--mesh_data", type=int, default=1,
                   help="device mesh 'data' axis size (1 = single device)")
    p.add_argument("--mesh_db", type=int, default=1,
                   help="device mesh 'db' axis size")
    p.add_argument("--shard_store", action="store_true",
                   help="pod-memory mode: shard the token store over 'db' "
                        "instead of replicating (byte-identical results)")
    return p


def _sim_parser(sub):
    p = sub.add_parser("simulate",
                       help="generate a simulated pan-genome (SimPan-like)")
    p.add_argument("-o", "--out_dir", required=True)
    p.add_argument("--genomes", type=int, default=10)
    p.add_argument("--core", type=int, default=200)
    p.add_argument("--accessory", type=int, default=100)
    p.add_argument("--accessory_freq", type=float, default=0.5)
    p.add_argument("--divergence", type=float, default=0.02)
    p.add_argument("--gene_codons", type=int, default=300)
    p.add_argument("--paralog_families", type=int, default=0)
    p.add_argument("--paralog_divergence", type=float, default=0.15)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--truth", default=None,
                   help="also write the gene->family truth table here")
    return p


def _selftest_parser(sub):
    p = sub.add_parser("selftest",
                       help="run the bundled examples end-to-end and check "
                            "recovered groups against the truth table")
    p.add_argument("-o", "--out_dir", default=None,
                   help="work dir (default: temp)")
    return p


def _run_selftest(args) -> int:
    """PEPPAN's --testunit analog: examples/ -> pipeline -> compare the
    recovered ortholog partition against examples/truth.tsv."""
    import os
    import tempfile

    from . import pipeline
    from .config import PipelineConfig

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exdir = os.path.join(root, "examples")
    gffs = sorted(os.path.join(exdir, f) for f in os.listdir(exdir)
                  if f.endswith(".gff"))
    truth = {}
    with open(os.path.join(exdir, "truth.tsv")) as fh:
        next(fh)
        for line in fh:
            g, fam = line.split()
            truth[g] = fam
    out = args.out_dir or tempfile.mkdtemp(prefix="peppan_selftest_")
    res = pipeline.run(gffs, PipelineConfig(prefix="SELFTEST"), out_dir=out)
    tl = [truth[n] for n in res.gene_store.names]
    fw, bw = {}, {}
    ok = True
    for t, g in zip(tl, res.group_of_gene):
        if fw.setdefault(t, g) != g or bw.setdefault(int(g), t) != t:
            ok = False
    n_fam = len(set(tl))
    n_grp = len(set(int(g) for g in res.group_of_gene))
    print(f"selftest: {len(gffs)} genomes, {res.gene_store.n_genes} genes, "
          f"{n_grp} groups vs {n_fam} truth families -> "
          f"{'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


def _parse_parser(sub):
    p = sub.add_parser("parse", help="post-process a PEPPAN.gff")
    p.add_argument("-g", "--gff", required=True, help="<prefix>.PEPPAN.gff")
    p.add_argument("-p", "--prefix", default="PEPPAN_TPU_OUT")
    p.add_argument("-m", "--matrix", action="store_true",
                   help="write gene presence/absence matrix (.Rtab)")
    p.add_argument("-t", "--tree", action="store_true",
                   help="write pan-genome NJ tree (.nwk)")
    p.add_argument("-a", "--cgav", type=float, default=None, metavar="PCT",
                   help="core alignment for groups in >= PCT%% of genomes")
    p.add_argument("-c", "--curve", action="store_true",
                   help="write rarefaction curve")
    p.add_argument("--input_gffs", nargs="*", default=[],
                   help="original input GFFs (needed for -a)")
    return p


def main(argv=None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname).1s %(message)s")
    ap = argparse.ArgumentParser(prog="peppan-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)
    _pan_parser(sub)
    _parse_parser(sub)
    _sim_parser(sub)
    _selftest_parser(sub)
    args = ap.parse_args(argv)

    if args.cmd == "selftest":
        from .utils import jaxinit
        jaxinit.setup_cache()
        return _run_selftest(args)

    if args.cmd == "simulate":
        from .utils import simulate as simmod

        sim = simmod.simulate(
            n_genomes=args.genomes, n_core=args.core,
            n_accessory=args.accessory, accessory_freq=args.accessory_freq,
            divergence=args.divergence, mean_gene_codons=args.gene_codons,
            paralog_families=args.paralog_families,
            paralog_divergence=args.paralog_divergence, seed=args.seed)
        paths = simmod.write_gff(sim, args.out_dir)
        if args.truth:
            with open(args.truth, "w") as fh:
                fh.write("gene\tfamily\n")
                for gid in sorted(sim.truth):
                    fh.write(f"{gid}\t{sim.truth[gid]}\n")
        print(f"wrote {len(paths)} genomes to {args.out_dir}")
        return 0

    from .utils import jaxinit
    jaxinit.setup_cache()

    if args.cmd == "pan":
        from . import pipeline
        from .config import PipelineConfig

        cfg = PipelineConfig(
            prefix=args.prefix, genes=tuple(args.genes),
            priority=tuple(args.priority),
            untrusted=tuple(args.untrusted),
            min_cds=args.min_cds,
            incomplete_cds=args.incompleteCDS, gtable=args.gtable,
            clust_identity=args.clust_identity,
            clust_match_prop=args.clust_match_prop,
            match_identity=args.match_identity, match_prop=args.match_prop,
            match_len=args.match_len,
            match_frag_len=args.match_frag_len,
            match_frag_prop=args.match_frag_prop,
            xdrop_floor=args.xdrop_floor, nucl_only=args.nucl,
            save_hits=args.save_hits,
            exhaustive_fallback=args.exhaustive_fallback,
            candidate_source=args.candidate_source,
            allowed_sigma=args.allowed_sigma,
            paralog_split=not args.noParalogSplit,
            synteny_gap=args.synteny_gap, synteny_diff=args.synteny_diff,
            neighbor_check=not args.noNeighborCheck,
            pseudogene_frac=args.pseudogene, band=args.band, kmer=args.kmer,
            window=args.window, sw_batch=args.sw_batch,
            mesh_data=args.mesh_data, mesh_db=args.mesh_db,
            shard_store=args.shard_store,
            continue_run=args.continue_run)
        res = pipeline.run(args.gffs, cfg, out_dir=args.out_dir)
        for k, v in res.outputs.items():
            print(f"{k}: {v}")
        return 0

    # parse subcommand
    from .postprocess import parser as post

    pan = post.read_pan_gff(args.gff)
    print(f"pan-genome: {len(pan.groups)} groups x {len(pan.genomes)} "
          f"genomes, {len(pan.records)} regions")
    if args.matrix:
        path = args.prefix + ".gene_content.Rtab"
        post.write_matrix(pan, path)
        print(f"matrix: {path}")
    if args.tree:
        path = args.prefix + ".tree.nwk"
        post.pan_tree(pan, path)
        print(f"tree: {path}")
    if args.cgav is not None:
        if not args.input_gffs:
            print("error: -a needs --input_gffs to fetch allele sequences",
                  file=sys.stderr)
            return 2
        fa = args.prefix + ".core.aln.fasta"
        snp = args.prefix + ".core.snps.tsv"
        ncore, nsnp = post.core_alignment(
            pan, args.input_gffs, fa, snp, core_frac=args.cgav / 100.0)
        print(f"core alignment: {fa} ({ncore} groups); snps: {snp} "
              f"({nsnp} sites)")
    if args.curve:
        path = args.prefix + ".rarefaction.tsv"
        post.rarefaction(pan, path)
        print(f"curve: {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
