"""Output writers: PEPPAN.gff, allele FASTA, gene_content matrix.

Format parity targets (reference: PEPPA.py::write_output and
PEPPA_parser.py — mount empty at build time; see SURVEY.md §0 and §7.3.6):
because the reference files are unavailable, these formats are defined here
once, documented, and golden-tested against committed fixtures of OUR OWN
output (self-consistency oracle).  When the reference mount is populated,
re-validate byte-layout against a real PEPPAN run and amend.

Files (for prefix P):
  P.PEPPAN.gff       unified pan-genome annotation; one CDS row per gene
                     region with ortholog-group provenance attributes
  P.allele.fna       one record per distinct allele per ortholog group,
                     named <group>_<allele_index>
  P.gene_content.Rtab Roary-compatible TSV presence/absence (0/1) matrix
  P.gene_content.csv  same with per-genome allele counts
"""

from __future__ import annotations

import numpy as np

from . import alphabet
from .tokens import GeneStore, GenomeStore


def write_pan_gff(path: str, genome_store: GenomeStore, gene_store: GeneStore,
                  group_of_gene: np.ndarray, group_names: list,
                  status: np.ndarray | None = None) -> None:
    """Write the unified pan-genome GFF.

    group_of_gene: int[n_genes] group index (-1 = unassigned/excluded)
    group_names:   list[str] group display names
    status:        optional str array: 'CDS' / 'pseudogene' / 'fragment'
    Rows are ordered (genome, contig, start) — deterministic.
    """
    n = gene_store.n_genes
    order = np.lexsort((gene_store.start, gene_store.contig,
                        gene_store.genome))
    allele_counter: dict = {}
    with open(path, "w") as fh:
        fh.write("##gff-version 3\n")
        fh.write("##source peppan_tpu pan-genome\n")
        for gi, gname in enumerate(genome_store.genome_names):
            fh.write(f"##genome {gname}\n")
        for idx in order:
            g = int(group_of_gene[idx])
            if g < 0:
                continue
            gname = genome_store.genome_names[gene_store.genome[idx]]
            cname = genome_store.contig_names[gene_store.contig[idx]]
            ftype = "CDS" if status is None else str(status[idx])
            strand = "+" if gene_store.strand[idx] > 0 else "-"
            allele_counter[g] = allele_counter.get(g, 0) + 1
            attrs = (f"ID={gname}:{gene_store.names[idx]};"
                     f"inference=ortholog_group:{group_names[g]};"
                     f"locus_tag={group_names[g]}")
            fh.write(f"{cname}\t{gname}\t{ftype}\t{gene_store.start[idx]}\t"
                     f"{gene_store.end[idx]}\t.\t{strand}\t0\t{attrs}\n")


def write_region_gff(path: str, genome_store: GenomeStore, regions,
                     group_names: list, gene_names: list) -> None:
    """Write the unified pan-genome GFF from assigned regions (phase 7 out).

    Region coords are 0-based inclusive internally -> 1-based GFF.  Rows
    ordered (genome, contig, start).  The `old_locus_tag` attribute links
    back to the input annotation when a region matches an annotated gene.
    """
    with open(path, "w") as fh:
        fh.write("##gff-version 3\n")
        fh.write("##source peppan_tpu pan-genome\n")
        for gname in genome_store.genome_names:
            fh.write(f"##genome {gname}\n")
        serial: dict = {}
        for i in range(len(regions)):
            g = int(regions.group[i])
            gname = genome_store.genome_names[int(regions.genome[i])]
            cname = genome_store.contig_names[int(regions.contig[i])]
            strand = "+" if regions.strand[i] > 0 else "-"
            serial[g] = serial.get(g, 0) + 1
            rid = f"{group_names[g]}_{serial[g]}"
            attrs = [f"ID={gname}:{rid}",
                     f"inference=ortholog_group:{group_names[g]}",
                     f"locus_tag={group_names[g]}",
                     f"identity={regions.identity[i]:.4f}"]
            gi = int(regions.gene_idx[i])
            if gi >= 0:
                attrs.append(f"old_locus_tag={gene_names[gi]}")
            fh.write(f"{cname}\t{gname}\t{regions.status[i]}\t"
                     f"{int(regions.start[i]) + 1}\t{int(regions.end[i]) + 1}"
                     f"\t.\t{strand}\t0\t{';'.join(attrs)}\n")


def region_presence_matrix(regions, n_groups: int,
                           n_genomes: int) -> np.ndarray:
    """int32[n_groups, n_genomes] region counts (CDS + pseudogene)."""
    mat = np.zeros((n_groups, n_genomes), dtype=np.int32)
    np.add.at(mat, (np.asarray(regions.group, np.int64),
                    np.asarray(regions.genome, np.int64)), 1)
    return mat


def write_alleles(path: str, gene_store: GeneStore, group_of_gene: np.ndarray,
                  group_names: list) -> None:
    """One FASTA record per distinct allele sequence per group.

    Alleles are numbered per group by first occurrence in gene order
    (genome-major) — deterministic.
    """
    n = gene_store.n_genes
    by_group: dict = {}
    for idx in range(n):
        g = int(group_of_gene[idx])
        if g < 0:
            continue
        by_group.setdefault(g, []).append(idx)
    with open(path, "w") as fh:
        for g in sorted(by_group):
            seen: dict = {}
            for idx in by_group[g]:
                seq = gene_store.gene_tokens(idx).tobytes()
                if seq not in seen:
                    seen[seq] = len(seen) + 1
                    s = alphabet.decode_dna(gene_store.gene_tokens(idx))
                    fh.write(f">{group_names[g]}_{seen[seq]}\n")
                    for i in range(0, len(s), 80):
                        fh.write(s[i:i + 80] + "\n")


def write_clusters(path: str, gene_store: GeneStore, exemplar: np.ndarray,
                   group_of_gene: np.ndarray, group_names: list) -> None:
    """<prefix>.clust.tab: gene -> cluster exemplar -> ortholog group
    (the user-facing analog of PEPPAN's mmseqs cluster table)."""
    with open(path, "w") as fh:
        fh.write("#gene\texemplar\tgroup\n")
        for i in range(gene_store.n_genes):
            g = int(group_of_gene[i])
            fh.write(f"{gene_store.names[i]}\t"
                     f"{gene_store.names[int(exemplar[i])]}\t"
                     f"{group_names[g] if g >= 0 else '-'}\n")


def presence_matrix(gene_store: GeneStore, group_of_gene: np.ndarray,
                    n_groups: int, n_genomes: int) -> np.ndarray:
    """int32[n_groups, n_genomes] copy counts (device-friendly scatter)."""
    mat = np.zeros((n_groups, n_genomes), dtype=np.int32)
    valid = group_of_gene >= 0
    np.add.at(mat, (group_of_gene[valid], gene_store.genome[valid]), 1)
    return mat


def write_gene_content(path_rtab: str, path_csv: str, matrix: np.ndarray,
                       group_names: list, genome_names: list) -> None:
    order = np.argsort(np.asarray(group_names, dtype=object))
    with open(path_rtab, "w") as fh:
        fh.write("Gene\t" + "\t".join(genome_names) + "\n")
        for g in order:
            row = "\t".join("1" if c > 0 else "0" for c in matrix[g])
            fh.write(f"{group_names[g]}\t{row}\n")
    with open(path_csv, "w") as fh:
        fh.write("Gene," + ",".join(genome_names) + "\n")
        for g in order:
            fh.write(group_names[g] + "," +
                     ",".join(str(int(c)) for c in matrix[g]) + "\n")


def write_gene_fasta(path: str, gene_store: GeneStore,
                     ids: np.ndarray | None = None) -> None:
    """Plain FASTA of gene sequences by annotation name.

    Reference parity: PEPPA writes the pooled gene FASTA
    (`<prefix>.genes.fna`, PEPPA.py::writeGenomes) and the cluster
    exemplar FASTA (getClust) as named intermediates users consume
    directly (SURVEY.md §2.1; mount empty at build time).  `ids=None`
    writes every gene in store order; otherwise exactly `ids`, in the
    given order (deterministic).
    """
    sel = np.arange(gene_store.n_genes) if ids is None else np.asarray(ids)
    with open(path, "w") as fh:
        for idx in map(int, sel):
            s = alphabet.decode_dna(gene_store.gene_tokens(idx))
            fh.write(f">{gene_store.names[idx]}\n")
            for i in range(0, len(s), 80):
                fh.write(s[i:i + 80] + "\n")


def write_map_hits(path: str, hits, gene_store: GeneStore,
                   genome_names: list, contig_names: list,
                   search_space: float, *, match: int = 2,
                   mismatch: int = -3) -> None:
    """<prefix>.map.tsv — the uberBlast tabular-hit-table analog.

    One row per genome-map hit with the BLAST-style presentation columns
    (bitscore, conservative e-value; ops.hitstats) next to the engine's
    exact raw score/identity/coverage.  Purely additive output: nothing
    downstream consumes these statistics.
    """
    from ..ops import hitstats
    lam = hitstats.dna_lambda(match, mismatch)
    qlen = gene_store.length[np.asarray(hits.exemplar, np.int64)]
    bits = hitstats.bit_scores(hits.score, lam)
    ev = hitstats.evalues(hits.score, lam, qlen, search_space)
    with open(path, "w") as fh:
        fh.write("#exemplar\tgenome\tcontig\tstart\tend\tstrand\tscore\t"
                 "identity\tqcov\tstitched\tbitscore\tevalue\n")
        for i in range(len(hits)):
            fh.write("\t".join([
                gene_store.names[int(hits.exemplar[i])],
                genome_names[int(hits.genome[i])],
                contig_names[int(hits.contig[i])],
                str(int(hits.start[i]) + 1),       # 1-based like GFF
                str(int(hits.end[i]) + 1),
                "+" if hits.strand[i] > 0 else "-",
                str(int(hits.score[i])),
                f"{float(hits.identity[i]):.4f}",
                f"{float(hits.qcov[i]):.4f}",
                "1" if hits.stitched[i] else "0",
                f"{bits[i]:.1f}",
                f"{ev[i]:.2e}",
            ]) + "\n")
