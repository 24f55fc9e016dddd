"""Protein-level similarity search — the DIAMOND stage equivalent.

PEPPAN's uberBlast runs DIAMOND on 6-frame translated queries to catch
homologs too diverged for nucleotide search (reference:
modules/uberBlast.py — mount empty at build time; role per SURVEY.md §2.2,
§3.2).  Genes here are annotated CDS, so a single frame-0 translation
suffices for the gene-vs-gene graph; sensitivity comes from Murphy-10
reduced-alphabet minimizers (ops.minimizers.aa_kmer_hashes) and BLOSUM62
banded SW on the same wavefront engine (protein instantiation per
SURVEY.md §7.1.3).

Synonymous divergence makes DNA identity crash while AA identity stays
high — these edges are exactly what this pass adds to the phase-4 graph
when ``--nucl`` is off.
"""

from __future__ import annotations

import numpy as np

from ..io import alphabet
from ..io.tokens import GeneStore, make_length_buckets
from ..utils import metrics
from . import minimizers, pairs as prs, sw


def translate_genes(genes: GeneStore, ids: np.ndarray,
                    gtable: int = 11) -> GeneStore:
    """Frame-0 translation of the selected genes -> AA GeneStore.

    The trailing stop codon is dropped; internal stops (incomplete CDS kept
    via --incompleteCDS) stay as STOP tokens and score -4 in BLOSUM62.
    """
    ids = np.asarray(ids)
    seqs = []
    for g in ids:
        aa = alphabet.translate(genes.gene_tokens(int(g)), gtable)
        if len(aa) and aa[-1] == alphabet.AA_STOP:
            aa = aa[:-1]
        seqs.append(aa)
    return GeneStore.from_sequences(
        seqs, genome=genes.genome[ids], contig=genes.contig[ids],
        start=genes.start[ids], end=genes.end[ids], strand=genes.strand[ids],
        names=[genes.names[int(g)] for g in ids])


def build_aa_minimizer_table(store: GeneStore, k: int = 7, w: int = 6,
                             batch: int = 512) -> prs.MinimizerTable:
    """AA analog of pairs.build_minimizer_table (no strand bit)."""
    n = store.n_genes
    if n == 0:
        z = np.zeros(0, np.uint32)
        return prs.MinimizerTable(z, z.astype(np.int32), z.astype(np.int32),
                                  z.astype(bool))
    buckets = make_length_buckets(int(store.length.max()))
    order = np.argsort(store.length, kind="stable")
    hs, gs, ps = [], [], []
    i = 0
    while i < n:
        j = min(i + batch, n)
        idx = order[i:j]
        width = int(buckets[np.searchsorted(
            buckets, int(store.length[idx].max()), side="left")])
        rows_padded = prs._pad_rows(j - i, batch)
        dense = np.full((rows_padded, width), alphabet.AA_PAD, np.int8)
        for row, gidx in enumerate(idx):
            t = store.gene_tokens(int(gidx))
            dense[row, :len(t)] = t[:width]
        rows, cols, hv = minimizers.aa_sketch_flagged(dense, k, w)
        keep = rows < j - i
        rows, cols = rows[keep], cols[keep]
        hs.append(hv[keep])
        gs.append(idx[rows].astype(np.int32))
        ps.append(cols.astype(np.int32))
        i = j
    h = np.concatenate(hs)
    g = np.concatenate(gs)
    p = np.concatenate(ps)
    order = np.lexsort((g, h))
    return prs.MinimizerTable(h[order], g[order], p[order],
                              np.ones(len(order), bool))


def verify_protein_pairs(store: GeneStore, pair_arr: np.ndarray, *,
                         band: int = 64, gap_open: int = 11,
                         gap_extend: int = 1,
                         batch: int = 2048) -> prs.PairHits:
    """BLOSUM62 banded SW over AA candidate pairs (stats mode)."""
    m = len(pair_arr)
    out = {k: np.zeros(m, np.int32) for k in
           ("score", "matches", "aln_len", "qspan", "tspan")}
    qlen = np.zeros(m, np.int64)
    tlen = np.zeros(m, np.int64)
    if m:
        la = store.length[pair_arr[:, 0]]
        lb = store.length[pair_arr[:, 1]]
        qidx = np.where(la <= lb, pair_arr[:, 0], pair_arr[:, 1])
        tidx = np.where(la <= lb, pair_arr[:, 1], pair_arr[:, 0])
        qlen = store.length[qidx].astype(np.int64)
        tlen = store.length[tidx].astype(np.int64)
        buckets = make_length_buckets(int(tlen.max()))
        tb = np.searchsorted(buckets, tlen, side="left")
        order = np.lexsort((np.arange(m), tb))
        scorer = sw.matrix_scorer(alphabet.blosum62_matrix())
        i = 0
        while i < m:
            j = min(i + batch, m)
            j = i + int(np.searchsorted(tb[order[i:j]], tb[order[i]],
                                        side="right"))
            sel = order[i:j]
            width = int(buckets[tb[sel[0]]])
            wq = max(int(buckets[np.searchsorted(
                buckets, int(qlen[sel].max()), side="left")]), band)
            P = prs._pad_rows(len(sel), batch)
            qd = np.full((P, wq), alphabet.AA_PAD, np.int8)
            td = np.full((P, width), alphabet.AA_PAD, np.int8)
            for row, (qi2, ti2) in enumerate(zip(qidx[sel], tidx[sel])):
                qt = store.gene_tokens(int(qi2))
                tt = store.gene_tokens(int(ti2))
                qd[row, :len(qt)] = qt[:wq]
                td[row, :len(tt)] = tt[:width]
            packed = np.asarray(sw.sw_banded_packed(
                qd, td, scorer=scorer, gap_open=gap_open,
                gap_extend=gap_extend, band=band, n_real_tokens=20,
                qpad=alphabet.AA_PAD, tpad=alphabet.AA_PAD))
            res = sw.unpack_stats(packed, len(sel))
            out["score"][sel] = res["score"]
            out["matches"][sel] = res["matches"]
            out["aln_len"][sel] = res["aln_len"]
            out["qspan"][sel] = res["qend"] - res["qstart"] + 1
            out["tspan"][sel] = res["tend"] - res["tstart"] + 1
            metrics.add("sw_pairs_protein", len(sel))
            metrics.add("sw_lane_cells", P * (wq + width - 1) * band)
            metrics.add("sw_launches", 1)
            i = j
    alen = np.maximum(out["aln_len"], 1)
    return prs.PairHits(
        pairs=np.asarray(pair_arr, np.int32),
        score=out["score"],
        identity=(out["matches"] / alen).astype(np.float32),
        qcov=(out["qspan"] / np.maximum(qlen, 1)).astype(np.float32),
        tcov=(out["tspan"] / np.maximum(tlen, 1)).astype(np.float32),
        matches=out["matches"],
        aln_len=out["aln_len"],
    )


def protein_similar_pairs(genes: GeneStore, ids: np.ndarray, *,
                          gtable: int = 11, k: int = 7, w: int = 6,
                          min_identity: float = 0.35, min_cov: float = 0.5,
                          max_group: int = 64, band: int = 64,
                          batch: int = 512) -> np.ndarray:
    """Edges (global gene-id pairs) whose PROTEIN alignment passes the
    thresholds — the additional homology the DNA pass cannot see."""
    ids = np.asarray(ids)
    aa = translate_genes(genes, ids, gtable)
    table = build_aa_minimizer_table(aa, k=k, w=w, batch=batch)
    cand, _, _ = prs.candidate_pairs(table, max_group=max_group)
    if len(cand) == 0:
        return np.zeros((0, 2), np.int64)
    hits = verify_protein_pairs(aa, cand, band=band, batch=batch)
    keep = ((hits.identity >= min_identity)
            & (np.maximum(hits.qcov, hits.tcov) >= min_cov))
    return ids[hits.pairs[keep]].astype(np.int64)
