"""Packed token stores: the framework's in-memory representation of sequences.

PEPPAN keeps sequences as Python strings in dicts and writes FASTA temp files
for its subprocess tools (reference: PEPPA.py::readGFF/addGenes — mount empty
at build time, per SURVEY.md §2.1).  Here, sequences live as one concatenated
int8 token array plus offset/length tensors — directly uploadable to device,
gather-friendly, and the substrate for bucketing/padding (SURVEY.md §7.0:
ragged data is the #1 TPU risk; we solve it structurally).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from . import alphabet


@dataclasses.dataclass
class GenomeStore:
    """All contigs of all genomes, concatenated.

    tokens:        int8[total]   forward-strand DNA tokens
    contig_offset: int64[n_contigs+1]  slice bounds into tokens
    contig_genome: int32[n_contigs]    owning genome index
    contig_names:  list[str]           contig seqids (GFF column 1)
    genome_names:  list[str]           genome labels (input file stems)
    """

    tokens: np.ndarray
    contig_offset: np.ndarray
    contig_genome: np.ndarray
    contig_names: list
    genome_names: list

    @property
    def n_contigs(self) -> int:
        return len(self.contig_names)

    @property
    def n_genomes(self) -> int:
        return len(self.genome_names)

    def contig_tokens(self, i: int) -> np.ndarray:
        return self.tokens[self.contig_offset[i]:self.contig_offset[i + 1]]

    def contig_index(self, genome: int, name: str) -> int:
        for i in range(self.n_contigs):
            if self.contig_genome[i] == genome and self.contig_names[i] == name:
                return i
        raise KeyError((genome, name))


@dataclasses.dataclass
class GeneStore:
    """Pooled CDS genes across all genomes, strand-corrected (always 5'->3').

    tokens:  int8[total]  concatenated gene DNA tokens
    offset:  int64[n+1]
    length:  int32[n]
    genome:  int32[n]   owning genome index
    contig:  int32[n]   owning contig index (into GenomeStore)
    start:   int64[n]   1-based inclusive start on contig (GFF convention)
    end:     int64[n]   1-based inclusive end
    strand:  int8[n]    +1 / -1
    names:   list[str]  gene IDs (GFF ID= attribute, or synthesized)
    """

    tokens: np.ndarray
    offset: np.ndarray
    length: np.ndarray
    genome: np.ndarray
    contig: np.ndarray
    start: np.ndarray
    end: np.ndarray
    strand: np.ndarray
    names: list

    @property
    def n_genes(self) -> int:
        return len(self.length)

    def gene_tokens(self, i: int) -> np.ndarray:
        return self.tokens[self.offset[i]:self.offset[i + 1]]

    def subset(self, idx: np.ndarray) -> "GeneStore":
        """New GeneStore containing genes idx (in that order)."""
        idx = np.asarray(idx)
        parts = [self.gene_tokens(int(i)) for i in idx]
        tokens = np.concatenate(parts) if parts else np.zeros(0, np.int8)
        lengths = self.length[idx]
        offset = np.zeros(len(idx) + 1, dtype=np.int64)
        np.cumsum(lengths, out=offset[1:])
        return GeneStore(
            tokens=tokens, offset=offset, length=lengths.astype(np.int32),
            genome=self.genome[idx], contig=self.contig[idx],
            start=self.start[idx], end=self.end[idx], strand=self.strand[idx],
            names=[self.names[int(i)] for i in idx],
        )

    def with_external(self, seqs: Sequence[np.ndarray], names: list,
                      genome_id: int) -> "GeneStore":
        """Append EXTERNAL genes (PEPPA's --genes curated references).

        External genes belong to a pseudo-genome (`genome_id`, an index
        past the real genomes) with no contigs: contig = -1 and zero
        coordinates, so they participate in pooling/clustering/exemplar
        choice but can never overlap-match an annotated locus or appear
        in the presence matrix (regions only land on real genomes).
        """
        n = len(seqs)
        if n == 0:
            return self
        lengths = np.asarray([len(s) for s in seqs], np.int32)
        offset = np.zeros(self.n_genes + n + 1, np.int64)
        offset[:self.n_genes + 1] = self.offset
        np.cumsum(lengths, out=offset[self.n_genes + 1:])
        offset[self.n_genes + 1:] += self.offset[-1]
        return GeneStore(
            tokens=np.concatenate(
                [self.tokens] + [np.asarray(s, np.int8) for s in seqs]),
            offset=offset,
            length=np.r_[self.length, lengths].astype(np.int32),
            genome=np.r_[self.genome,
                         np.full(n, genome_id, np.int32)].astype(np.int32),
            contig=np.r_[self.contig, np.full(n, -1, np.int32)].astype(
                np.int32),
            start=np.r_[self.start, np.ones(n, np.int64)].astype(np.int64),
            end=np.r_[self.end, np.zeros(n, np.int64)].astype(np.int64),
            strand=np.r_[self.strand, np.ones(n, np.int8)].astype(np.int8),
            names=list(self.names) + list(names),
        )

    @staticmethod
    def from_sequences(seqs: Sequence[np.ndarray], *, genome=None, contig=None,
                       start=None, end=None, strand=None, names=None) -> "GeneStore":
        n = len(seqs)
        lengths = np.array([len(s) for s in seqs], dtype=np.int32)
        offset = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=offset[1:])
        tokens = (np.concatenate([np.asarray(s, np.int8) for s in seqs])
                  if n else np.zeros(0, np.int8))

        def arr(x, dtype, fill=0):
            return np.asarray(x, dtype) if x is not None else np.full(n, fill, dtype)

        return GeneStore(
            tokens=tokens, offset=offset, length=lengths,
            genome=arr(genome, np.int32), contig=arr(contig, np.int32),
            start=arr(start, np.int64, 1), end=arr(end, np.int64, 0),
            strand=arr(strand, np.int8, 1),
            names=list(names) if names is not None else [f"g_{i}" for i in range(n)],
        )


# --- Length bucketing --------------------------------------------------------

def make_length_buckets(max_len: int, base: int = 128, growth: float = 1.5) -> np.ndarray:
    """Monotone bucket boundaries: [128, 192, 288, ...] >= max_len, each a
    multiple of 128 (TPU lane width).  SURVEY.md §7.0: finite bucket set so
    kernels compile once per bucket."""
    out = []
    b = base
    while True:
        out.append(b)
        if b >= max_len:
            break
        b = int(np.ceil(b * growth / 128.0) * 128)
    return np.asarray(out, dtype=np.int32)


def bucket_of(lengths: np.ndarray, buckets: np.ndarray) -> np.ndarray:
    """Index of the smallest bucket >= each length."""
    return np.searchsorted(buckets, lengths, side="left").astype(np.int32)


def pad_to_dense(store: GeneStore, idx: np.ndarray, width: int,
                 pad_value: int = alphabet.DNA_PAD) -> np.ndarray:
    """Gather genes idx into a dense int8[len(idx), width] padded matrix.
    Fully vectorized (one fancy-index gather) — this runs on the host for
    every device batch, so it must keep up with the TPU."""
    idx = np.asarray(idx)
    if len(idx) == 0:
        return np.full((0, width), pad_value, dtype=np.int8)
    lengths = np.minimum(store.length[idx], width)
    pos = np.arange(width)
    flat = store.offset[idx][:, None] + pos[None, :]
    np.minimum(flat, max(len(store.tokens) - 1, 0), out=flat)
    out = store.tokens[flat]
    out[pos[None, :] >= lengths[:, None]] = pad_value
    return out
