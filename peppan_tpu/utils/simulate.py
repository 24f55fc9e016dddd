"""Synthetic pan-genome generator (SimPan-like) for tests and benchmarks.

PEPPAN's paper validates against simulated pan-genomes from the companion
tool SimPan (github.com/zheminzhou/SimPan); the bundled examples/ dataset is
its only integration fixture (SURVEY.md §4.1).  With the reference mount
empty, this module is the source of all fixtures: it emits Prokka-style
GFF3(+##FASTA) files AND the ground-truth ortholog labels, so end-to-end
tests can check recovered ortholog groups against truth (SURVEY.md §7.3.6).

Model: an ancestral pool of gene families; each genome carries every core
family and a Bernoulli subset of accessory families, laid out in a conserved
synteny order on one circular contig with random intergenic spacers; each
gene copy accumulates point mutations at a configurable per-site divergence;
mutated internal stop codons are repaired so the genes remain complete CDS;
optional within-genome paralog duplications at higher divergence exercise the
tree-aware splitting path.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from ..io import alphabet

_STOP_CODONS = {(3, 0, 0), (3, 0, 2), (3, 2, 0)}  # TAA TAG TGA (table 11)
_STOP_IDS = np.array([16 * a + 4 * b + c for (a, b, c) in _STOP_CODONS])
_NONSTOP_IDS = np.array([i for i in range(64) if i not in set(_STOP_IDS)])


def _codon_ids(cod: np.ndarray) -> np.ndarray:
    return 16 * cod[:, 0].astype(np.int64) + 4 * cod[:, 1] + cod[:, 2]


def _random_cds(rng: np.random.Generator, n_codons: int) -> np.ndarray:
    """Random complete CDS: ATG + (n_codons-2) non-stop codons + TAA."""
    ids = rng.choice(_NONSTOP_IDS, size=n_codons - 2)
    body = np.stack([(ids >> 4) & 3, (ids >> 2) & 3, ids & 3], axis=1)
    out = np.concatenate([
        np.array([0, 3, 2]),          # ATG
        body.reshape(-1),
        np.array([3, 0, 0]),          # TAA
    ])
    return out.astype(np.int8)


def _mutate(rng: np.random.Generator, gene: np.ndarray, divergence: float) -> np.ndarray:
    """Point-mutate at per-site rate `divergence`, preserving CDS completeness."""
    g = gene.copy()
    n = len(g)
    mask = rng.random(n) < divergence
    mask[:3] = False          # keep start codon
    mask[n - 3:] = False      # keep stop codon
    shifts = rng.integers(1, 4, size=n).astype(np.int8)
    g = np.where(mask, (g + shifts) % 4, g).astype(np.int8)
    # repair internal stops created by mutation (vectorized: only actual
    # stop codons get resampled from the non-stop set)
    cod = g[:-3].reshape(-1, 3)
    while True:
        bad = np.flatnonzero(np.isin(_codon_ids(cod[1:]), _STOP_IDS)) + 1
        if len(bad) == 0:
            break
        ids = rng.choice(_NONSTOP_IDS, size=len(bad))
        cod[bad, 0] = (ids >> 4) & 3
        cod[bad, 1] = (ids >> 2) & 3
        cod[bad, 2] = ids & 3
    return g


def synonymous_recode(rng: np.random.Generator, gene: np.ndarray,
                      table_id: int = 11) -> np.ndarray:
    """Recode every codon to a random synonymous codon (AA identity 1.0,
    DNA identity typically ~0.6-0.75) — exercises the protein-level search
    path where nucleotide homology has decayed."""
    code = alphabet.genetic_code_table(table_id)
    by_aa: dict = {}
    for c in range(64):
        by_aa.setdefault(int(code[c]), []).append(c)
    cod = gene.reshape(-1, 3).copy()
    for i in range(1, len(cod) - 1):   # keep start + stop codons
        cid = 16 * int(cod[i, 0]) + 4 * int(cod[i, 1]) + int(cod[i, 2])
        aa = int(code[cid])
        options = by_aa[aa]
        new = options[int(rng.integers(0, len(options)))]
        cod[i] = [(new >> 4) & 3, (new >> 2) & 3, new & 3]
    return cod.reshape(-1).astype(np.int8)


@dataclasses.dataclass
class SimulatedPanGenome:
    genome_names: list          # [n_genomes]
    contigs: list               # per genome: {contig_name: np.int8 tokens}
    features: list              # per genome: [(contig, start, end, strand, gene_id)]
    truth: dict                 # gene_id -> ortholog family name


def simulate(n_genomes: int = 4, n_core: int = 20, n_accessory: int = 10,
             accessory_freq: float = 0.5, divergence: float = 0.02,
             mean_gene_codons: int = 300, paralog_families: int = 0,
             paralog_divergence: float = 0.15, seed: int = 0) -> SimulatedPanGenome:
    rng = np.random.default_rng(seed)
    n_fam = n_core + n_accessory
    fam_len = np.maximum(60, rng.poisson(mean_gene_codons, size=n_fam))
    ancestors = [_random_cds(rng, int(L)) for L in fam_len]
    # paralogs descend from a single ancestral duplication: one diverged
    # copy per family, from which every genome's second copy then evolves
    par_ancestors = [_mutate(rng, ancestors[fi], paralog_divergence)
                     for fi in range(min(paralog_families, n_fam))]
    fam_names = [f"FAM_{i:04d}" for i in range(n_fam)]

    genome_names, contigs, features = [], [], []
    truth: dict = {}
    for gi in range(n_genomes):
        gname = f"SIM_{gi:03d}"
        genome_names.append(gname)
        present = [fi for fi in range(n_fam)
                   if fi < n_core or rng.random() < accessory_freq]
        parts, feats = [], []
        pos = 1  # 1-based GFF coordinate
        spacer0 = rng.integers(50, 200)
        parts.append(rng.integers(0, 4, size=spacer0).astype(np.int8))
        pos += spacer0
        gene_counter = 0
        for fi in present:
            copies = 1
            if fi < paralog_families:
                copies = 2
            for ci in range(copies):
                base = ancestors[fi] if ci == 0 else par_ancestors[fi]
                g = _mutate(rng, base, divergence)
                strand = 1 if rng.random() < 0.5 else -1
                gid = f"{gname}_{gene_counter:05d}"
                gene_counter += 1
                placed = g if strand > 0 else alphabet.revcomp(g)
                start, endp = pos, pos + len(g) - 1
                parts.append(placed)
                feats.append((f"{gname}_contig1", start, endp, strand, gid))
                truth[gid] = fam_names[fi] + ("" if ci == 0 else f"_par{ci}")
                spacer = rng.integers(50, 300)
                parts.append(rng.integers(0, 4, size=spacer).astype(np.int8))
                pos = endp + 1 + spacer
        contigs.append({f"{gname}_contig1": np.concatenate(parts)})
        features.append(feats)
    return SimulatedPanGenome(genome_names, contigs, features, truth)


def write_gff(sim: SimulatedPanGenome, out_dir: str) -> list:
    """Write one GFF3+##FASTA file per genome; returns the file paths."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for gi, gname in enumerate(sim.genome_names):
        path = os.path.join(out_dir, f"{gname}.gff")
        with open(path, "w") as fh:
            fh.write("##gff-version 3\n")
            for cname, toks in sim.contigs[gi].items():
                fh.write(f"##sequence-region {cname} 1 {len(toks)}\n")
            for (cname, s, e, st, gid) in sim.features[gi]:
                strand = "+" if st > 0 else "-"
                fh.write(f"{cname}\tsim\tCDS\t{s}\t{e}\t.\t{strand}\t0\t"
                         f"ID={gid};locus_tag={gid}\n")
            fh.write("##FASTA\n")
            for cname, toks in sim.contigs[gi].items():
                fh.write(f">{cname}\n")
                s = alphabet.decode_dna(toks)
                for i in range(0, len(s), 80):
                    fh.write(s[i:i + 80] + "\n")
        paths.append(path)
    return paths
