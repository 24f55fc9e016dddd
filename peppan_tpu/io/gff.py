"""GFF3(+FASTA) reader: annotated genomes -> GenomeStore/GeneStore.

Parity target: PEPPA.py::readGFF (reference mount empty at build time;
behaviour reconstructed per SURVEY.md §2.1 "GFF reader"):
  - input is one Prokka-style GFF3 per genome, with contig sequences either
    embedded under ``##FASTA`` or in an adjacent ``.fna``/``.fasta`` file;
  - CDS features are extracted, minus-strand CDS reverse-complemented;
  - short CDS (< min_cds, PEPPAN flag ``--min_cds``) are dropped;
  - incomplete CDS (length not divisible by 3, internal stop codons, missing
    start/stop) are dropped unless ``incomplete_cds`` allows them
    (PEPPAN flag ``--incompleteCDS``; exact code letters TO-VERIFY once the
    reference mount is populated).

A C++ fast path for tokenization lives in native/ (ctypes), with this pure
Python implementation as the always-available fallback and oracle.
"""

from __future__ import annotations

import dataclasses
import gzip
import os
import re
from typing import Iterable

import numpy as np

from . import alphabet
from . import native
from .tokens import GeneStore, GenomeStore

_ATTR_ID = re.compile(r"(?:^|;)\s*ID=([^;]+)")
_ATTR_NAME = re.compile(r"(?:^|;)\s*(?:Name|gene|locus_tag)=([^;]+)")


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path, "rt")


@dataclasses.dataclass
class RawGenome:
    name: str
    contigs: dict            # seqid -> np.int8 tokens
    features: list           # (seqid, start, end, strand, feat_id)


def _parse_fasta_lines(lines: Iterable[str]) -> dict:
    contigs: dict = {}
    cur = None
    buf: list = []
    for line in lines:
        line = line.rstrip("\n")
        if line.startswith(">"):
            if cur is not None:
                contigs[cur] = alphabet.encode_dna("".join(buf))
            cur = line[1:].split()[0]
            buf = []
        elif cur is not None:
            buf.append(line.strip())
    if cur is not None:
        contigs[cur] = alphabet.encode_dna("".join(buf))
    return contigs


def _parse_fasta_bytes(buf: bytes) -> dict:
    """FASTA bytes -> {name: tokens}; native fast path, Python fallback."""
    res = native.fasta_tokenize(buf)
    if res is not None:
        return {name: res["tokens"][res["offsets"][i]:res["offsets"][i + 1]]
                for i, name in enumerate(res["names"])}
    return _parse_fasta_lines(buf.decode("ascii", "replace").splitlines())


def read_fasta(path: str) -> dict:
    if path.endswith(".gz"):
        with gzip.open(path, "rb") as fh:
            return _parse_fasta_bytes(fh.read())
    with open(path, "rb") as fh:
        return _parse_fasta_bytes(fh.read())


def read_gff(path: str, genome_name: str | None = None,
             feature_types: tuple = ("CDS",)) -> RawGenome:
    """Parse one GFF3 file (with optional embedded ##FASTA)."""
    name = genome_name
    if name is None:
        base = os.path.basename(path)
        for suf in (".gz", ".gff3", ".gff"):
            if base.endswith(suf):
                base = base[: -len(suf)]
        name = base

    if path.endswith(".gz"):
        with gzip.open(path, "rb") as fh:
            raw = fh.read()
    else:
        with open(path, "rb") as fh:
            raw = fh.read()
    # split the (small) feature section from the (large) FASTA tail so the
    # FASTA bytes can go straight to the native tokenizer
    idx = raw.find(b"##FASTA")
    if idx >= 0:
        head, fasta_buf = raw[:idx], raw[raw.find(b"\n", idx) + 1:]
    else:
        head, fasta_buf = raw, b""

    features: list = []
    for line in head.decode("ascii", "replace").splitlines():
        if not line.strip() or line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) < 9:
            continue
        seqid, _src, ftype, start, end, _score, strand, _frame, attrs = parts[:9]
        if ftype not in feature_types:
            continue
        m = _ATTR_ID.search(attrs) or _ATTR_NAME.search(attrs)
        fid = m.group(1) if m else f"{name}_{len(features):05d}"
        features.append((seqid, int(start), int(end),
                         1 if strand != "-" else -1, fid))

    contigs = _parse_fasta_bytes(fasta_buf) if fasta_buf else {}
    if not contigs:
        # adjacent FASTA: foo.gff -> foo.fna / foo.fasta / foo.fa (opt. .gz)
        stem = re.sub(r"\.gz$", "", path)
        stem = re.sub(r"\.gff3?$", "", stem)
        for ext in (".fna", ".fasta", ".fa", ".fna.gz", ".fasta.gz", ".fa.gz"):
            if os.path.exists(stem + ext):
                contigs = read_fasta(stem + ext)
                break
    if not contigs:
        raise FileNotFoundError(
            f"{path}: no ##FASTA section and no adjacent FASTA file found")
    return RawGenome(name=name, contigs=contigs, features=features)


def check_cds(tokens: np.ndarray, table_id: int = 11) -> str:
    """Classify a strand-corrected CDS. Returns '' if complete, else a reason.

    Mirrors PEPPA.py::checkCDS semantics per SURVEY.md §2.1 (TO-VERIFY):
    complete = length % 3 == 0, valid start (ATG/GTG/TTG), ends with a stop
    codon, and no internal stop.
    """
    if len(tokens) % 3 != 0:
        return "frame"
    if len(tokens) < 6:
        return "short"
    aa = alphabet.translate(tokens, table_id)
    if aa[-1] != alphabet.AA_STOP:
        return "no_stop"
    if (aa[:-1] == alphabet.AA_STOP).any():
        return "internal_stop"
    first = tokens[:3]
    starts = {(0, 3, 2), (2, 3, 2), (3, 3, 2)}  # ATG, GTG, TTG
    if tuple(int(x) for x in first) not in starts:
        return "no_start"
    return ""


# --incompleteCDS letter codes (normative convention pending mount
# verification, SURVEY.md §5.6): s = missing start, e = missing stop (end),
# i = internal stop, f = frame (length % 3 != 0)
_INCOMPLETE_CODE = {"no_start": "s", "no_stop": "e", "internal_stop": "i",
                    "frame": "f"}


def incomplete_allowed(reason: str, policy: bool | str) -> bool:
    """Does the --incompleteCDS policy keep a CDS with this defect?

    policy False/'' drops every incomplete CDS; True keeps them all; a
    string of letter codes keeps only the listed defects ('short' — under
    two codons — is never kept)."""
    if policy is True:
        return reason != "short"
    if not policy:
        return False
    return _INCOMPLETE_CODE.get(reason, "?") in policy


def load_genomes(paths: list, *, min_cds: int = 120,
                 incomplete_cds: bool | str = False,
                 gtable: int = 11) -> tuple:
    """Read many GFF files -> (GenomeStore, GeneStore).

    Genomes are ordered as given; genes are ordered genome-major then by
    (contig order in file, start) — this ordering is part of the framework's
    determinism contract (SURVEY.md §4.2.3).
    """
    raws = [read_gff(p) for p in paths]

    contig_tokens: list = []
    contig_names: list = []
    contig_genome: list = []
    genome_names: list = []
    contig_lookup: dict = {}
    for gi, rg in enumerate(raws):
        genome_names.append(rg.name)
        for cname, ctoks in rg.contigs.items():
            contig_lookup[(gi, cname)] = len(contig_names)
            contig_names.append(cname)
            contig_genome.append(gi)
            contig_tokens.append(ctoks)

    contig_offset = np.zeros(len(contig_tokens) + 1, dtype=np.int64)
    np.cumsum([len(t) for t in contig_tokens], out=contig_offset[1:])
    genome_store = GenomeStore(
        tokens=np.concatenate(contig_tokens) if contig_tokens else np.zeros(0, np.int8),
        contig_offset=contig_offset,
        contig_genome=np.asarray(contig_genome, np.int32),
        contig_names=contig_names,
        genome_names=genome_names,
    )

    seqs, genome, contig, start, end, strand, names = [], [], [], [], [], [], []
    for gi, rg in enumerate(raws):
        feats = [f for f in rg.features if (gi, f[0]) in contig_lookup]
        feats.sort(key=lambda f: (contig_lookup[(gi, f[0])], f[1], f[2]))
        for (seqid, s, e, st, fid) in feats:
            ci = contig_lookup[(gi, seqid)]
            ctoks = genome_store.contig_tokens(ci)
            if not (1 <= s <= e <= len(ctoks)):
                continue
            g = ctoks[s - 1:e]
            if st < 0:
                g = alphabet.revcomp(g)
            if len(g) < min_cds:
                continue
            reason = check_cds(g, gtable)
            if reason and not incomplete_allowed(reason, incomplete_cds):
                continue
            seqs.append(g)
            genome.append(gi)
            contig.append(ci)
            start.append(s)
            end.append(e)
            strand.append(st)
            names.append(fid)

    gene_store = GeneStore.from_sequences(
        seqs, genome=genome, contig=contig, start=start, end=end,
        strand=strand, names=names)
    return genome_store, gene_store
