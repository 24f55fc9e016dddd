"""Protein-level genome mapping — the uberBlast DIAMOND-vs-genome stage.

PEPPAN's phase-5 uberBlast searches genomes with DIAMOND on 6-frame
translations so gene copies too diverged for nucleotide search (or
disrupted ones) are still found (reference: modules/uberBlast.py — mount
empty; role per SURVEY.md §2.2/§3.2).  TPU-native version:

  1. the genome's six translated frames (3 forward, 3 on the reverse
     complement) become AA token rows, chunked and sketched with the
     Murphy-10 reduced-alphabet minimizers (one batched device pass);
  2. exemplar proteins of the groups still MISSING in that genome join
     against the frame index; seeds chain per (frame, diagonal);
  3. candidate windows align with BLOSUM62 banded SW (device, stats);
  4. AA frame coordinates convert back to forward-strand nucleotide
     coordinates; scores rescale to nucleotide-equivalents
     (3 * match_score * AA matches) so the greedy assignment can rank
     DNA- and protein-sourced hits together (uberBlast's rescoring role).

Frame coordinate conventions (contig length L, frame f in 0..2):
  forward:  AA position a covers nucl [3a + f, 3a + f + 2]
  reverse:  frames translate revcomp(contig); AA position a covers
            revcomp coords [3a + f, 3a + f + 2]  which are forward-strand
            [L - 3 - 3a - f, L - 1 - 3a - f], strand = -1.
"""

from __future__ import annotations

import numpy as np

from ..io import alphabet
from ..io.tokens import GeneStore, GenomeStore
from ..utils import metrics
from . import minimizers, protein, sw
from .genome_map import MapHits


# cross-frame chain clustering tolerances: chains of one strand group
# whose nucleotide diagonals sit within _FS_JUMP_NT are fragments of one
# (possibly frameshifted) copy; fragments at least _MIN_SUBFRAG_AA long
# may ride a cluster whose pooled span passes min_frag_aa
_FS_JUMP_NT = 96
_MIN_SUBFRAG_AA = 8
# async sketch pipeline depth (launches in flight before draining the
# oldest); 0 = fully synchronous
_SKETCH_DEPTH = 8


def _frame_rows(contig: np.ndarray, gtable: int) -> list:
    """[(frame_id 0..5, aa_tokens)] for one contig (0-2 fwd, 3-5 rc).
    One shared-sweep translate6 call (see io.alphabet.translate6)."""
    return list(enumerate(alphabet.translate6(contig, gtable)))


def _frame_one(contig: np.ndarray, fid: int, gtable: int) -> np.ndarray:
    """aa tokens of ONE frame (0-2 fwd, 3-5 rc) — the window-collection
    path only ever needs the frame a chain landed in, and re-deriving all
    six per lookup was 6x redundant translation work (round-2 review)."""
    if fid < 3:
        return alphabet.translate(contig[fid:], gtable)
    return alphabet.translate(alphabet.revcomp(contig)[fid - 3:], gtable)


def _frame_slice(contig: np.ndarray, fid: int, gtable: int,
                 a0: int, b0: int) -> np.ndarray:
    """aa tokens of frame ``fid`` positions [a0, b0) — translating ONLY
    the covering nucleotide slice.  Bit-equal to
    ``_frame_one(contig, fid, gtable)[a0:b0]`` (for b0 <= frame length)
    but O(window) instead of O(contig): whole-contig translation per
    candidate window was the measured pmap_t_jw_window wall (9.3 s of
    the degraded-session L3 profile, round-4b counters).

    Reverse frames (3-5) translate revcomp(contig)[f:], so aa position a
    covers revcomp coords [f + 3a, f + 3a + 2] = forward coords
    [L - f - 3a - 3, L - f - 3a - 1]; the covering forward slice for
    [a0, b0) is contig[L - f - 3*b0 : L - f - 3*a0], revcomp'd."""
    f = fid % 3
    if fid < 3:
        return alphabet.translate(contig[f + 3 * a0:f + 3 * b0], gtable)
    L = len(contig)
    return alphabet.translate(
        alphabet.revcomp(contig[max(0, L - f - 3 * b0):L - f - 3 * a0]),
        gtable)


def map_missing_protein(genes: GeneStore, genomes: GenomeStore,
                        exemplar_ids: np.ndarray, missing: dict, *,
                        gtable: int = 11, k: int = 7, w: int = 6,
                        min_identity: float = 0.35, min_frag_aa: int = 20,
                        band: int = 64, slack: int = 24, batch: int = 1024,
                        gap_open: int = 11, gap_extend: int = 1,
                        match_score: int = 2, chunk: int = 1 << 13,
                        min_seeds: int = 2, xdrop_floor: int = 0,
                        mesh=None) -> MapHits:
    """Protein-search genomes for exemplars missing there.

    missing: {genome_index: [exemplar gene ids]}.  Returns MapHits in
    forward-strand nucleotide coordinates with nucl-equivalent scores.

    mesh: optional ('data','db') jax mesh — the BLOSUM62 window-align
    launches shard their rows over the flattened device axis
    (genome_map.launch_rows_sharded, shard_map manual SPMD),
    byte-identical to single-device.

    xdrop_floor: DIAMOND's ungapped seed-extension stage (SURVEY §2.2
    diamond row) — each candidate window's best ungapped BLOSUM62
    segment along its chain-anchor diagonal (exact, vectorized Kadane)
    must reach the floor or the window skips the banded DP.  0 (the
    default) disables: Murphy-10 seeds are reduced-alphabet exact, and
    the EDNQ group's worst within-group substitution scores 0 in true
    BLOSUM62, so a bare 7-mer seed can score 0 — no positive floor is
    exact, and the 100-genome ladder measured a real kept anchor at
    exactly 15 (watermark counter pmap_xdrop_min_kept), i.e. modest
    floors already graze real windows.  Opt-in speed/sensitivity knob.
    """
    import time as _time

    if not missing:
        return MapHits.concat([])
    _t = _time.perf_counter()
    all_ex = sorted({int(e) for exs in missing.values() for e in exs})
    aa_store = protein.translate_genes(genes, np.asarray(all_ex), gtable)
    ex_of_row = {i: e for i, e in enumerate(all_ex)}
    aa_tbl = protein.build_aa_minimizer_table(aa_store, k=k, w=w,
                                              batch=batch)

    metrics.add("pmap_t_qprep", _time.perf_counter() - _t)
    _t = _time.perf_counter()

    # per-genome query minimizer subsets (skip genomes with no queries)
    queries = {}
    for gidx, ex_list in sorted(missing.items()):
        ex_rows = np.asarray(
            [i for i, e in ex_of_row.items() if e in set(map(int, ex_list))])
        if len(ex_rows) == 0:
            continue
        sel = np.isin(aa_tbl.gene, ex_rows)
        if sel.any():
            queries[gidx] = (aa_tbl.hash[sel], aa_tbl.gene[sel],
                             aa_tbl.pos[sel])

    # --- 6-frame AA minimizer tables for ALL queried genomes, sketched in
    # SHARED fixed-shape launches.  The per-genome variant paid one ~150 ms
    # tunnel launch (and often a recompile: variable row counts) per
    # genome — minutes of pure latency at 500-2000 genomes. -------------
    overlap = k + w
    sketch_rows = 512
    per_g: dict = {g: [] for g in queries}   # [(hash, ctg, fid, pos)]
    buf_meta: list = []                      # (gidx, ci, fid, s, first)
    buf_rows: list = []

    # union-of-queries bloom: the device drops frame minimizers that can't
    # join any missing exemplar's hash before the fetch (the dense
    # uint32[512, chunk] fetch at ~16 MB/s was this stage's bottleneck);
    # exact w.r.t. the per-genome joins below (supersets only add rows the
    # join discards — see ops.minimizers)
    bloom_dev = None
    if queries:
        import jax.numpy as _jnp
        qh_all = np.unique(np.concatenate(
            [q[0] for q in queries.values()]))
        bloom_dev = _jnp.asarray(minimizers.make_hash_bloom(
            qh_all, minimizers.BLOOM_BITS_AA))

    # ASYNC sketch pipeline (round 4): launch, slice and decode stages run
    # a bounded lag apart (minimizers.MatchedSketchPipeline) so the three
    # per-flush tunnel round trips — counts, then the packed hash+col
    # fetch — overlap later flushes' compute instead of serializing
    # (~450 ms per 512-row flush measured synchronous).
    pipe = (minimizers.MatchedSketchPipeline(
                bloom_dev, k=k, w=w, cap=1024,
                bits=minimizers.BLOOM_BITS_AA, protein=True,
                lag=_SKETCH_DEPTH) if bloom_dev is not None else None)

    def _consume(metas, rr, cc, hv):
        nrows = len(metas)
        valid = rr < nrows
        rr, cc, hv = rr[valid], cc[valid], hv[valid]
        # per-ROW metadata as columnar arrays once, then vectorized
        # gather — a python list-comp per MINIMIZER here was ~10^6
        # interpreter ops per flush (measured hotspot at 100+ genomes)
        meta_g = np.asarray([m[0] for m in metas], np.int64)
        meta_c = np.asarray([m[1] for m in metas], np.int32)
        meta_f = np.asarray([m[2] for m in metas], np.int8)
        meta_s = np.asarray([m[3] for m in metas], np.int64)
        firsts = np.asarray([m[4] for m in metas], bool)
        keep = firsts[rr] | (cc >= overlap)
        rr, cc, hv = rr[keep], cc[keep], hv[keep]
        gx = meta_g[rr]
        ct = meta_c[rr]
        fd = meta_f[rr]
        ps = meta_s[rr] + cc
        for g in np.unique(gx):
            m = gx == g
            per_g[int(g)].append((hv[m], ct[m], fd[m], ps[m]))

    def _flush():
        if not buf_rows:
            return
        dense = np.full((sketch_rows, chunk), alphabet.AA_PAD, np.int8)
        for i, r in enumerate(buf_rows):
            dense[i, :len(r)] = r
        metas = list(buf_meta)
        buf_meta.clear()
        buf_rows.clear()
        if pipe is not None:
            for ms, out in pipe.push(dense, metas):
                _consume(ms, *out)
        else:
            _consume(metas, *minimizers.aa_sketch_flagged(dense, k, w))

    for gidx in sorted(queries):
        for ci in np.flatnonzero(
                np.asarray(genomes.contig_genome) == gidx):
            toks = genomes.contig_tokens(int(ci))
            _ts = _time.perf_counter()
            frames = _frame_rows(toks, gtable)
            metrics.add("pmap_t_sk_translate", _time.perf_counter() - _ts)
            for (fid, aa) in frames:
                for si, s in enumerate(range(0, max(len(aa) - overlap, 1),
                                             chunk - overlap)):
                    buf_meta.append((gidx, int(ci), fid, s, si == 0))
                    buf_rows.append(aa[s:s + chunk])
                    if len(buf_rows) == sketch_rows:
                        _flush()
    _flush()
    if pipe is not None:
        for ms, out in pipe.finish():
            _consume(ms, *out)
    metrics.add("pmap_t_sketch", _time.perf_counter() - _t)
    _t = _time.perf_counter()

    rows_out = []
    cand_all = []   # (aa row, genome, contig, frame, win start, win aa, cid)
    cid_base = 0    # cross-frame cluster ids, unique across genomes
    for gidx in sorted(queries):
        _tg = _time.perf_counter()
        qh, qg, qp = queries[gidx]
        parts = per_g[gidx]
        if not parts:
            continue
        gh = np.concatenate([p[0] for p in parts])
        gctg = np.concatenate([p[1] for p in parts])
        gfid = np.concatenate([p[2] for p in parts])
        gposa = np.concatenate([p[3] for p in parts])
        if len(gh) < (1 << 32):
            packed = ((gh.astype(np.uint64) << np.uint64(32))
                      | np.arange(len(gh), dtype=np.uint64))
            packed.sort()          # stable argsort via one simd sort
            order = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
        else:
            order = np.argsort(gh, kind="stable")
        gh, gctg, gfid, gposa = (gh[order], gctg[order], gfid[order],
                                 gposa[order])
        metrics.add("pmap_t_jw_gsort", _time.perf_counter() - _tg)
        _tg = _time.perf_counter()

        # --- join + chain ------------------------------------------------
        lo = np.searchsorted(gh, qh, side="left")
        hi = np.searchsorted(gh, qh, side="right")
        cnt = hi - lo
        keep = (cnt > 0) & (cnt <= 64)   # single-genome index: flat cap ok
        reps = cnt[keep]
        if reps.sum() == 0:
            continue
        base = np.repeat(lo[keep], reps)
        off = np.arange(len(base)) - np.repeat(np.cumsum(reps) - reps, reps)
        flat = base + off
        s_ex = np.repeat(qg[keep], reps)
        s_qp = np.repeat(qp[keep], reps).astype(np.int64)
        s_ct, s_f, s_gp = gctg[flat], gfid[flat], gposa[flat]
        diag = s_gp - s_qp
        order2 = np.lexsort((s_gp, diag, s_f, s_ct, s_ex))
        exs, cts, fds = s_ex[order2], s_ct[order2], s_f[order2]
        dgs, gps2, qps2 = diag[order2], s_gp[order2], s_qp[order2]
        brk = np.ones(len(order2), bool)
        if len(order2) > 1:
            brk[1:] = ((exs[1:] != exs[:-1]) | (cts[1:] != cts[:-1])
                       | (fds[1:] != fds[:-1])
                       | (np.abs(dgs[1:] - dgs[:-1]) > 24)
                       | (gps2[1:] - gps2[:-1] > 700))
        first = np.flatnonzero(brk)
        c_ex, c_ct, c_f = exs[first], cts[first], fds[first]
        c_g, c_q = gps2[first], qps2[first]
        metrics.add("pmap_t_jw_chain", _time.perf_counter() - _tg)
        _tg = _time.perf_counter()
        # --- frameshift-aware cross-frame chain clustering ---------------
        # A frameshifted copy produces chains in DIFFERENT frames of one
        # strand group whose NUCLEOTIDE diagonals differ by only the indel
        # size.  Cluster chains of one (exemplar, contig, strand group) by
        # nt-diagonal proximity; the DIAMOND two-hit rule and (below) the
        # min_frag_aa span floor then apply at the CLUSTER level, so frame
        # fragments that are individually sub-threshold still surface and
        # stitch into one disrupted region (SURVEY §2.2 diamond row,
        # round-2 verdict item 5).  Reverse frames cluster in revcomp-space
        # coordinates — orientation-consistent within the strand group.
        nseeds = np.diff(np.r_[first, len(order2)])
        nt_diag = (3 * c_g.astype(np.int64) + c_f % 3
                   - 3 * c_q.astype(np.int64))
        sgrp = c_f < 3
        order4 = np.lexsort((nt_diag, sgrp, c_ct, c_ex))
        cl_brk = np.ones(len(order4), bool)
        if len(order4) > 1:
            cl_brk[1:] = (
                (c_ex[order4][1:] != c_ex[order4][:-1])
                | (c_ct[order4][1:] != c_ct[order4][:-1])
                | (sgrp[order4][1:] != sgrp[order4][:-1])
                | (nt_diag[order4][1:] - nt_diag[order4][:-1] > _FS_JUMP_NT))
        cid_sorted = np.cumsum(cl_brk) - 1
        cid = np.empty(len(order4), np.int64)
        cid[order4] = cid_sorted
        n_cl = int(cid_sorted[-1]) + 1 if len(cid_sorted) else 0
        cl_seeds = np.zeros(n_cl, np.int64)
        np.add.at(cl_seeds, cid, nseeds)
        # two-hit rule on the cluster's pooled seeds (DIAMOND's
        # double-indexing analog); short proteins keep the single-seed
        # escape like the DNA path's fragment exception
        Laa_chain = aa_store.length[c_ex].astype(np.int64)
        chain_keep = ~((cl_seeds[cid] < min_seeds)
                       & (Laa_chain > 4 * min_frag_aa))
        c_ex, c_ct, c_f = c_ex[chain_keep], c_ct[chain_keep], c_f[chain_keep]
        c_g, c_q = c_g[chain_keep], c_q[chain_keep]
        cid = cid[chain_keep]
        metrics.add("pmap_t_jw_cluster", _time.perf_counter() - _tg)
        _tg = _time.perf_counter()

        # --- collect candidate windows (host slices; alignment is batched
        # across ALL genomes below — one row per launch wasted 7/8 of every
        # launch and paid ~150 ms tunnel latency per candidate) -----------
        # vectorized window geometry + dedup FIRST, then materialize only
        # surviving windows (the python per-chain loop with a set was the
        # scale cost here; window slices are few after quantized dedup)
        if len(c_ex):
            Laa_k = aa_store.length[c_ex].astype(np.int64)
            a_arr = np.maximum(0, c_g.astype(np.int64)
                               - c_q.astype(np.int64) - slack)
            # frame length without translating: (contig_len - f) // 3
            clen = (np.asarray(genomes.contig_offset)[c_ct + 1]
                    - np.asarray(genomes.contig_offset)[c_ct])
            flen = (clen - (c_f % 3)) // 3
            b_arr = np.minimum(flen, a_arr + Laa_k + 2 * slack)
            # a window must fit SOME useful fragment; the cluster-level
            # span test below owns the min_frag_aa decision
            ok = (b_arr - a_arr) >= min(min_frag_aa, _MIN_SUBFRAG_AA)
            # nearby chains collapse to one window: quantizing the start
            # by `slack` dedups same-locus candidates (the window already
            # carries +-slack around the chain anchor); too-short windows
            # never claim a key (a later same-key chain may still win)
            kept = np.flatnonzero(ok)
            qkey = np.stack([c_ex[kept].astype(np.int64),
                             c_ct[kept].astype(np.int64),
                             c_f[kept].astype(np.int64),
                             a_arr[kept] // max(slack, 1)], axis=1)
            _, first_idx = np.unique(qkey, axis=0, return_index=True)
            strip_rows, strip_meta = [], []
            blosum = (alphabet.blosum62_matrix().astype(np.int32)
                      if xdrop_floor > 0 else None)
            for ci2 in kept[np.sort(first_idx)]:
                row = int(c_ex[ci2])
                ctg = int(c_ct[ci2])
                fid = int(c_f[ci2])
                ctoks = genomes.contig_tokens(ctg)
                a = int(a_arr[ci2])
                b = int(b_arr[ci2])
                # O(window) slice translation (_frame_slice) — the
                # whole-frame-per-candidate translation this replaces
                # was the measured pmap_t_jw_window wall
                rec = (row, gidx, ctg, fid, a,
                       np.ascontiguousarray(
                           _frame_slice(ctoks, fid, gtable, a, b)),
                       cid_base + int(cid[ci2]))
                if blosum is None:
                    cand_all.append(rec)
                    continue
                # ungapped pre-extension on the chain-anchor diagonal
                qt = aa_store.gene_tokens(row)
                d0 = int(c_g[ci2]) - int(c_q[ci2])
                j0 = max(0, -d0)
                j1 = min(len(qt), int(flen[ci2]) - d0)
                if j1 <= j0:
                    metrics.add("pmap_xdrop_dropped", 1)
                    continue
                strip_rows.append(blosum[qt[j0:j1], _frame_slice(
                    ctoks, fid, gtable, d0 + j0, d0 + j1)])
                strip_meta.append(rec)
            if strip_meta:
                from .genome_map import _ungapped_best
                best = _ungapped_best(strip_rows)
                weak = best < xdrop_floor
                if weak.any():
                    metrics.add("pmap_xdrop_dropped", int(weak.sum()))
                if (~weak).any():
                    metrics.low("pmap_xdrop_min_kept",
                                int(best[~weak].min()))
                cand_all.extend(r for r, w in zip(strip_meta, weak)
                                if not w)
        if len(c_ex):
            cid_base += int(cid.max()) + 1
        metrics.add("pmap_t_jw_window", _time.perf_counter() - _tg)

    # --- batched alignment over all collected candidates ------------------
    metrics.add("pmap_t_join_window", _time.perf_counter() - _t)
    _t = _time.perf_counter()
    from ..io.tokens import make_length_buckets
    if cand_all:
        import functools

        from ..utils.fetch import copy_async
        from .genome_map import launch_rows_sharded
        scorer = sw.matrix_scorer(alphabet.blosum62_matrix())
        launch_fn = functools.partial(
            sw.sw_banded_packed, scorer=scorer, gap_open=gap_open,
            gap_extend=gap_extend, band=band, n_real_tokens=20,
            qpad=alphabet.AA_PAD, tpad=alphabet.AA_PAD)
        wbuckets = make_length_buckets(
            max(max(len(c[5]) for c in cand_all), band))
        qmaxb = int(wbuckets[np.searchsorted(
            wbuckets, max(int(aa_store.length.max()), band), side="left")])
        by_bucket: dict = {}
        for c in cand_all:
            wbi = int(np.searchsorted(wbuckets, len(c[5]), side="left"))
            by_bucket.setdefault(wbi, []).append(c)
        launches = []
        import jax
        warmed: set = set()
        for wbi, rows2 in sorted(by_bucket.items()):
            W = int(wbuckets[wbi])
            i2 = 0
            while i2 < len(rows2):
                chunk_rows = rows2[i2:i2 + batch]
                P = len(chunk_rows)
                Ppad = 256 if P <= 256 else batch   # two shapes per width
                qd = np.full((Ppad, qmaxb), alphabet.AA_PAD, np.int8)
                td = np.full((Ppad, W), alphabet.AA_PAD, np.int8)
                for ri, (row, _g, _c, _f, _a, win,
                         _cid) in enumerate(chunk_rows):
                    qt = aa_store.gene_tokens(row)
                    qd[ri, :len(qt)] = qt[:qmaxb]
                    td[ri, :len(win)] = win[:W]
                handle = launch_rows_sharded(mesh, launch_fn, qd, td)
                if (Ppad, W) not in warmed:
                    jax.block_until_ready(handle)
                    warmed.add((Ppad, W))
                copy_async(handle)
                launches.append((chunk_rows, handle))
                metrics.add("sw_launches", 1)
                metrics.add("protein_map_windows", len(chunk_rows))
                metrics.add("sw_lane_cells", Ppad * (qmaxb + W - 1) * band)
                i2 += batch
        metrics.add("pmap_t_launch", _time.perf_counter() - _t)
        _t = _time.perf_counter()

        # pass 1: collect fragments that pass the identity floor, pooling
        # query-interval coverage per cross-frame cluster
        frags = []            # (cluster, span, qstart, qend, row record)
        cl_ivals: dict = {}   # cluster -> [(qstart, qend)]
        from ..utils.fetch import fetch_np
        for chunk_rows, handle in launches:
            res = sw.unpack_stats(fetch_np(handle), len(chunk_rows))
            for ri, (row, gidx, ctg, fid, a, win,
                     cluster) in enumerate(chunk_rows):
                alen = int(res["aln_len"][ri])
                if alen == 0:
                    continue
                ident = res["matches"][ri] / alen
                qs = int(res["qstart"][ri])
                qe = int(res["qend"][ri])
                span = qe - qs + 1
                if (ident < min_identity
                        or span < min(min_frag_aa, _MIN_SUBFRAG_AA)):
                    continue
                Laa = int(aa_store.length[row])
                # AA window coords -> frame coords -> fwd nucl coords
                aa_s = a + int(res["tstart"][ri])
                aa_e = a + int(res["tend"][ri])
                L = int(genomes.contig_offset[ctg + 1]
                        - genomes.contig_offset[ctg])
                f = fid % 3
                if fid < 3:
                    ns, ne = 3 * aa_s + f, 3 * aa_e + f + 2
                    strand = 1
                else:
                    ns = L - 3 - 3 * aa_e - f
                    ne = L - 1 - 3 * aa_s - f
                    strand = -1
                ns, ne = max(0, ns), min(L - 1, ne)
                rec = dict(
                    exemplar=int(ex_of_row[row]), genome=gidx, contig=ctg,
                    start=ns, end=ne, strand=strand,
                    score=int(3 * match_score * res["matches"][ri]),
                    identity=float(ident),
                    qcov=span / max(Laa, 1), stitched=False)
                lst = cl_ivals.setdefault(cluster, [])
                frags.append((cluster, span, len(lst), rec))
                lst.append((qs, qe))

        def _union(ivals):
            tot, last_end = 0, -1
            for (qs, qe) in sorted(ivals):
                if qs > last_end:
                    tot += qe - qs + 1
                    last_end = qe
                elif qe > last_end:
                    tot += qe - last_end
                    last_end = qe
            return tot

        # pass 2: a fragment passes on its own span, OR on its cluster's
        # pooled query coverage (union of intervals — frame fragments of
        # one frameshifted copy cover complementary query ranges, so a
        # copy whose halves are individually below min_frag_aa still
        # surfaces; downstream dedup_and_stitch merges them into one
        # disrupted region).  A rescued fragment must CONTRIBUTE new
        # query coverage (>= _MIN_SUBFRAG_AA beyond the others' union):
        # wrong-frame re-finds of an already-covered range stay dropped.
        for cluster, span, pos, rec in frags:
            if span >= min_frag_aa:
                rows_out.append(rec)
                continue
            ivals = cl_ivals[cluster]
            others = [iv for i2, iv in enumerate(ivals) if i2 != pos]
            pooled = _union(ivals)
            if (pooled >= min_frag_aa
                    and pooled - _union(others) >= _MIN_SUBFRAG_AA):
                rows_out.append(rec)
                metrics.add("pmap_fs_rescued", 1)

    metrics.add("pmap_t_fetch", _time.perf_counter() - _t)
    if not rows_out:
        return MapHits.concat([])
    rows_out.sort(key=lambda r: (r["genome"], r["contig"], r["start"],
                                 r["exemplar"]))
    return MapHits(
        exemplar=np.asarray([r["exemplar"] for r in rows_out], np.int32),
        genome=np.asarray([r["genome"] for r in rows_out], np.int32),
        contig=np.asarray([r["contig"] for r in rows_out], np.int32),
        start=np.asarray([r["start"] for r in rows_out], np.int64),
        end=np.asarray([r["end"] for r in rows_out], np.int64),
        strand=np.asarray([r["strand"] for r in rows_out], np.int8),
        score=np.asarray([r["score"] for r in rows_out], np.int32),
        identity=np.asarray([r["identity"] for r in rows_out], np.float32),
        qcov=np.asarray([r["qcov"] for r in rows_out], np.float32),
        stitched=np.zeros(len(rows_out), bool),
    )
