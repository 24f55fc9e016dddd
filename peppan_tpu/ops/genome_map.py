"""Genome mapping: align group exemplars onto every genome (phase 5).

PEPPAN's iter_map_bsn/get_map_bsn (reference: PEPPA.py — mount empty at
build time; role per SURVEY.md §2.1/§3.1 phase 5) runs uberBlast of every
exemplar against every genome to find ALL copies of each gene family —
annotated or not, intact or disrupted — producing per-genome hit tables
that the greedy ortholog assignment consumes.

TPU-native pipeline:
  1. canonical-minimizer index over genome contigs (device sketch, host
     sorted table);
  2. exemplar-vs-genome seed join; seeds chained by (contig, strand,
     diagonal) proximity into candidate placements (minimap2-style: minus
     strand uses the anti-diagonal g + i as the chain key);
  3. window extraction around each candidate (host slice, revcomp for minus
     strand) into fixed-width buckets;
  4. one banded-SW stats pass per bucket (device) -> exact coordinates,
     identity and exemplar coverage, mapped back to forward-strand genome
     coordinates;
  5. same-group hits separated by at most `stitch_gap` on one contig/strand
     merge into a single disrupted-gene region (frameshift/IS-insertion
     stitching, the uberBlast HSP-merge equivalent of SURVEY.md §3.2).
"""

from __future__ import annotations

import dataclasses

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..io import alphabet
from ..io.tokens import GeneStore, GenomeStore, make_length_buckets
from ..utils import metrics
from ..utils.fetch import copy_async, fetch_np
from . import minimizers, sw


@dataclasses.dataclass
class GenomeIndex:
    hash: np.ndarray     # uint32[n] sorted
    contig: np.ndarray   # int32[n]
    pos: np.ndarray      # int64[n] position on forward strand
    strand: np.ndarray   # bool[n] forward-kmer-is-canonical
    k: int
    w: int


def index_genomes(store: GenomeStore, *, k: int = 13, w: int = 8,
                  chunk: int = 1 << 14, rows_per_launch: int = 512,
                  query_hashes: np.ndarray | None = None,
                  match_cap: int = 4096) -> GenomeIndex:
    """Minimizer index over all contigs (device sketch in fixed chunks).

    Chunks from ALL contigs batch into shared launches — per-launch
    round-trip latency dominates on the tunnelled backend, so one launch
    per contig (the obvious loop) is ~25 s for 100 genomes vs ~2 s batched.

    query_hashes: optional sorted/unique hash set the index will be
    equi-joined against (the exemplar minimizer table).  When given, the
    device drops non-matching minimizers before the fetch (bloom
    membership + top_k compaction — exact w.r.t. the join, see
    ops.minimizers module comment) so each launch fetches ~cap*8 bytes
    per row instead of the dense chunk*4 (the fetch was this phase's
    measured bottleneck: ~16 MB/s through the tunnel).
    """
    import time as _time
    _t = _time.perf_counter()
    bloom_dev = None
    if query_hashes is not None:
        import jax.numpy as _jnp
        bloom_dev = _jnp.asarray(minimizers.make_hash_bloom(
            query_hashes, minimizers.BLOOM_BITS_DNA))
    overlap = k + w          # so no window is lost at chunk boundaries
    row_meta = []            # (contig, chunk_start, is_first)
    for ci in range(store.n_contigs):
        n = int(store.contig_offset[ci + 1] - store.contig_offset[ci])
        for si, s in enumerate(range(0, max(n - overlap, 1),
                                     chunk - overlap)):
            row_meta.append((ci, s, si == 0))
    hs, cs, ps, ss = [], [], [], []

    def _collect(metas, rr, cc, hv, sv):
        first = np.asarray([m[2] for m in metas], bool)
        starts_arr = np.asarray([m[1] for m in metas], np.int64)
        contig_arr = np.asarray([m[0] for m in metas], np.int32)
        # drop duplicated flags in the overlap region of non-first chunks
        keep = first[rr] | (cc >= overlap)
        rr, cc = rr[keep], cc[keep]
        hs.append(hv[keep])
        ss.append(sv[keep])
        ps.append(starts_arr[rr] + cc)
        cs.append(contig_arr[rr])

    # the matched path pipelines launch/slice/decode so the three per-flush
    # tunnel round trips overlap later flushes (round-4 map_t_index wall
    # was exactly this loop run synchronously: ~620 ms per 512-row flush)
    pipe = (minimizers.MatchedSketchPipeline(
                bloom_dev, k=k, w=w, cap=match_cap,
                bits=minimizers.BLOOM_BITS_DNA, protein=False)
            if bloom_dev is not None else None)
    for i0 in range(0, len(row_meta), rows_per_launch):
        metas = row_meta[i0:i0 + rows_per_launch]
        _tf = _time.perf_counter()
        dense = np.full((len(metas), chunk), alphabet.DNA_PAD, np.int8)
        for ri, (ci, s, _f) in enumerate(metas):
            seg = store.contig_tokens(ci)[s:s + chunk]
            dense[ri, :len(seg)] = seg
        metrics.add("map_t_idx_fill", _time.perf_counter() - _tf)
        _tf = _time.perf_counter()
        if pipe is not None:
            for ms, out in pipe.push(dense, metas):
                _collect(ms, *out)
        else:
            _collect(metas, *minimizers.sketch_flagged(dense, k, w))
        metrics.add("map_t_idx_pipe", _time.perf_counter() - _tf)
    _tf = _time.perf_counter()
    if pipe is not None:
        for ms, out in pipe.finish():
            _collect(ms, *out)
    metrics.add("map_t_idx_pipe", _time.perf_counter() - _tf)
    h = np.concatenate(hs) if hs else np.zeros(0, np.uint32)
    c = np.concatenate(cs) if cs else np.zeros(0, np.int32)
    p = np.concatenate(ps) if ps else np.zeros(0, np.int64)
    s = np.concatenate(ss) if ss else np.zeros(0, bool)
    _tf = _time.perf_counter()
    if len(h) < (1 << 32):
        # stable argsort via ONE simd np.sort on (hash << 32 | row):
        # numpy's u64 np.sort is ~15x its u32 stable argsort at the
        # 10^7-row scale of this index (round-3 map_t_index wall)
        packed = ((h.astype(np.uint64) << np.uint64(32))
                  | np.arange(len(h), dtype=np.uint64))
        packed.sort()
        order = (packed & np.uint64(0xFFFFFFFF)).astype(np.int64)
    else:
        order = np.argsort(h, kind="stable")
    metrics.add("map_t_idx_sort", _time.perf_counter() - _tf)
    metrics.add("map_t_index", _time.perf_counter() - _t)
    return GenomeIndex(h[order], c[order], p[order], s[order], k, w)


_shard_map_cache: dict = {}


def launch_rows_sharded(mesh, fn, q, t):
    """Run a packed-stats launch ``fn(q, t) -> int32[7, rows]`` with its
    rows sharded over the flattened ('data','db') mesh axis (SURVEY §2.3
    DP row / §7.1.4 genomes x genes tile alignment).  The genome-map
    window launches are the pipeline's dominant phase (449.9 s of
    876.9 s at the 2000-genome rung), so on real multi-chip hardware
    they must scale like the verification passes rather than run on the
    default device.

    MANUAL SPMD via shard_map, not GSPMD sharding propagation: each
    device traces ``fn`` on its LOCAL (rows/n_dev, width) shard, so the
    backend kernel dispatch inside ops.sw — including the Pallas fast
    paths — sees local shapes, and Mosaic custom calls never meet
    GSPMD's partitioner (an untested combination on pods; round-5
    review).  Per-shard row counts that fail the Pallas P %% 128 guard
    simply take the XLA-scan engine on that shard — dispatch is decided
    per-device, bit-equal either way.  Rows are per-window independent,
    so sharding never changes results (asserted byte-identical by
    tests/determinism/test_mesh_pipeline.py and the driver dryrun).

    mesh=None runs ``fn`` unchanged.  Row counts that do not divide the
    flattened device count (the 256-row small-launch floor meeting a
    >256-device pod, or a tiny --sw_batch) fall back to the unsharded
    path for that launch and count ``launch_shard_fallback`` so a
    silently-unsharded dominant phase is visible in the counters.

    ``fn`` should be a stable callable (module function or a partial
    built once per phase) — the shard_map-wrapped jit is cached on
    (mesh, fn) identity, so per-launch lambdas would retrace."""
    if mesh is None:
        return fn(q, t)
    n_dev = len(mesh.devices.flat)
    if q.shape[0] % n_dev:
        metrics.add("launch_shard_fallback", 1)
        return fn(q, t)
    key = (mesh, fn)
    sfn = _shard_map_cache.get(key)
    if sfn is None:
        from jax.sharding import PartitionSpec
        spec = PartitionSpec(("data", "db"))
        sfn = jax.jit(jax.shard_map(
            fn, mesh=mesh, in_specs=(spec, spec),
            out_specs=PartitionSpec(None, ("data", "db"))))
        _shard_map_cache[key] = sfn
    from jax.sharding import NamedSharding, PartitionSpec
    sh = NamedSharding(mesh, PartitionSpec(("data", "db")))
    return sfn(jax.device_put(q, sh), jax.device_put(t, sh))


@dataclasses.dataclass
class MapHits:
    """Exemplar placements on genomes (parallel arrays, fwd-strand coords,
    0-based inclusive)."""
    exemplar: np.ndarray   # int32[m] gene id of the exemplar
    genome: np.ndarray     # int32[m]
    contig: np.ndarray     # int32[m]
    start: np.ndarray      # int64[m]
    end: np.ndarray        # int64[m]
    strand: np.ndarray     # int8[m]
    score: np.ndarray      # int32[m]
    identity: np.ndarray   # float32[m]
    qcov: np.ndarray       # float32[m] fraction of exemplar aligned
    stitched: np.ndarray   # bool[m] merged from multiple fragments

    def __len__(self):
        return len(self.exemplar)

    @staticmethod
    def concat(parts: list) -> "MapHits":
        if not parts:
            z = np.zeros(0)
            return MapHits(*(z.astype(t) for t in
                             (np.int32, np.int32, np.int32, np.int64,
                              np.int64, np.int8, np.int32, np.float32,
                              np.float32, bool)))
        return MapHits(*(np.concatenate([getattr(p, f.name) for p in parts])
                         for f in dataclasses.fields(MapHits)))


def _ungapped_best(score_rows: list) -> np.ndarray:
    """Best ungapped segment score per row (vectorized Kadane).

    score_rows: list of 1-D int arrays of per-position substitution
    scores along a seed diagonal.  max-subarray = max over j of
    cumsum[j] - min prefix before j — two cumulative passes, no loop.
    """
    if not score_rows:
        return np.zeros(0, np.int32)
    out = np.empty(len(score_rows), np.int32)
    CH = 4096
    for i0 in range(0, len(score_rows), CH):
        chunk = score_rows[i0:i0 + CH]
        Lp = max(len(r) for r in chunk)
        s = np.full((len(chunk), Lp), -100, np.int32)
        for ri, r in enumerate(chunk):
            s[ri, :len(r)] = r
        c = np.cumsum(s, axis=1)
        prefix_min = np.minimum.accumulate(
            np.concatenate([np.zeros((len(chunk), 1), np.int64), c[:, :-1]],
                           axis=1), axis=1)
        out[i0:i0 + CH] = (c - prefix_min).max(axis=1).astype(np.int32)
    return out


def _ungapped_best_segmented(vals: np.ndarray,
                             seg0: np.ndarray) -> np.ndarray:
    """Best ungapped segment score per CONCATENATED segment (vectorized
    segmented Kadane; bit-equal to _ungapped_best over the row list).

    vals: int per-position substitution scores, segments starting at
    seg0 (every segment non-empty).  max-subarray per segment = max_j
    (cumsum_j - min prefix before j, floored at the segment start);
    the segmented min-accumulate uses a per-segment -BIG offset so a
    single global minimum.accumulate cannot leak across segments
    (earlier segments sit at strictly larger offsets)."""
    if len(seg0) == 0:
        return np.zeros(0, np.int32)
    n = len(vals)
    seg_id = np.zeros(n, np.int64)
    seg_id[seg0[1:]] = 1
    seg_id = np.cumsum(seg_id)
    c = np.cumsum(vals.astype(np.int64))
    base_seg = np.concatenate([[np.int64(0)], c[seg0[1:] - 1]])
    local_c = c - base_seg[seg_id]          # per-segment local cumsum
    is_start = np.zeros(n, bool)
    is_start[seg0] = True
    P = np.empty(n, np.int64)
    P[0] = 0
    P[1:] = local_c[:-1]
    P[is_start] = 0
    _BIG = np.int64(1) << 40
    m = np.minimum.accumulate(P - seg_id * _BIG)
    minpref = m + seg_id * _BIG
    return np.maximum.reduceat(local_c - minpref, seg0).astype(np.int32)


def map_exemplars(genes: GeneStore, genomes: GenomeStore,
                  exemplar_ids: np.ndarray, index: GenomeIndex, *,
                  min_identity: float = 0.65, min_frag_len: int = 50,
                  min_frag_prop: float = 0.0,
                  band: int = 128, slack: int = 64, batch: int = 2048,
                  gap_open: int = 5, gap_extend: int = 2,
                  min_seeds: int = 2, stitch_gap: int = 300,
                  max_seed_occ: int | None = None,
                  xdrop_floor: int = 0,
                  launch_cache=None, table=None, mesh=None) -> MapHits:
    """Map every exemplar gene onto every genome.

    mesh: optional ('data','db') jax mesh — window-align launches shard
    their rows over the flattened device axis (launch_rows_sharded), the
    same data-parallel treatment as verify_pairs; byte-identical to the
    single-device path.

    launch_cache: optional utils.manifest.LaunchCache — persists each
    launch's unpacked stats so a backend stall mid-phase resumes at the
    failed launch instead of voiding the whole phase (SURVEY §5.4).
    table: optional prebuilt exemplar MinimizerTable (must come from
    genes.subset(exemplar_ids) at the index's k/w — the pipeline builds
    it once and shares it with index_genomes' membership prefilter).
    xdrop_floor: blastn's ungapped pre-extension stage (SURVEY §2.2
    blastn row: seed -> ungapped extend -> gapped extend).  Each chained
    candidate gets an exact best-ungapped-segment score along its anchor
    seed's diagonal (vectorized Kadane over the real substitution
    scores, N/PAD semantics included); candidates below the floor skip
    the full-band DP.  0 disables.  EXACTNESS (round 4): every chained
    candidate's anchor diagonal contains its exact k=13 seed scoring 26,
    and a true hit whose seed is immediately flanked by indels scores
    exactly that — so 26 (the pipeline default) is the provably lossless
    maximum and higher floors are lossy by construction.  Floors > 26
    carry runtime insurance: a deterministic 1/17 sample (<= 256) of
    dropped windows still runs the full DP, and a qualifying probe hit
    is kept AND raises the loud map_xdrop_recovered counter + a log
    warning (counters map_xdrop_dropped / map_xdrop_min_kept record the
    margin every run).
    """
    import time as _time

    from . import pairs as prs

    _t = _time.perf_counter()

    # --- seeds: batched sketch of all exemplars, vectorized hash join -----
    sub = genes.subset(np.asarray(exemplar_ids))
    tbl = (table if table is not None else
           prs.build_minimizer_table(sub, k=index.k, w=index.w, batch=batch))
    lo = np.searchsorted(index.hash, tbl.hash, side="left")
    hi = np.searchsorted(index.hash, tbl.hash, side="right")
    cnt = hi - lo
    # repetitive-seed cap MUST scale with genome count: a single-copy core
    # gene's minimizer legitimately occurs once PER GENOME in the index
    # (a fixed cap of 64 silently blinded mapping beyond ~60 genomes)
    if max_seed_occ is None:
        max_seed_occ = max(64, 4 * genomes.n_genomes)
    keep = (cnt > 0) & (cnt <= max_seed_occ)
    reps = cnt[keep]
    if reps.sum() == 0:
        return MapHits.concat([])
    # flat indices into the genome index: lo repeated + within-run offsets
    base = np.repeat(lo[keep], reps)
    off = np.arange(len(base)) - np.repeat(
        np.cumsum(reps) - reps, reps)
    flat = base + off
    ex_r = np.repeat(tbl.gene[keep], reps)         # subset-local exemplar id
    qpos_r = np.repeat(tbl.pos[keep], reps).astype(np.int64)
    qstr_r = np.repeat(tbl.strand[keep], reps)
    gpos = index.pos[flat]
    gcontig = index.contig[flat]
    rel = index.strand[flat] == qstr_r             # True = forward match

    # --- vectorized chaining: consecutive seeds (sorted by exemplar,
    # contig, strand, diagonal, position) chain while the diagonal moves
    # <= 64 and the position gap <= 2000; a chain's anchor is its first
    # seed (minimap2-lite; the reference's HSP chaining analog) ----------
    qlen_of = sub.length
    diag = np.where(rel, gpos - qpos_r, gpos + qpos_r)
    # two-pass packed sort == lexsort((gpos, diag, rel, gcontig, ex_r))
    # (the 5-key lexsort over the seed join was 26 s of map_t_seed_chain
    # at the 100-genome rung).  LSD: unstable sort by the low keys
    # (diag, gpos) — full-key ties are impossible (a (diag, gpos) pair
    # fixes qpos, and (table row, index row) pairs are unique) — then a
    # STABLE sort by the high keys (ex, contig, rel) via the packed
    # simd np.sort-with-carried-index trick.
    if (len(diag) < (1 << 26) and gpos.max() < (1 << 26)
            and gcontig.max() < (1 << 18) and ex_r.max() < (1 << 19)):
        kA = (((diag - diag.min()).astype(np.uint64) << np.uint64(26))
              | gpos.astype(np.uint64))
        o1 = np.argsort(kA)
        kB = ((ex_r[o1].astype(np.uint64) << np.uint64(45))
              | (gcontig[o1].astype(np.uint64) << np.uint64(27))
              | (rel[o1].astype(np.uint64) << np.uint64(26))
              | np.arange(len(o1), dtype=np.uint64))
        kB.sort()
        order = o1[(kB & np.uint64((1 << 26) - 1)).astype(np.int64)]
    else:    # fields exceed the pack budget: plain lexsort
        order = np.lexsort((gpos, diag, rel, gcontig, ex_r))
    metrics.add("map_t_sort", _time.perf_counter() - _t)
    metrics.add("map_seeds", len(order))
    exs, cts, rls = ex_r[order], gcontig[order], rel[order]
    dgs, gps, qps = diag[order], gpos[order], qpos_r[order]
    brk = np.ones(len(order), dtype=bool)
    if len(order) > 1:
        brk[1:] = ((exs[1:] != exs[:-1]) | (cts[1:] != cts[:-1])
                   | (rls[1:] != rls[:-1])
                   | (np.abs(dgs[1:] - dgs[:-1]) > 64)
                   | (gps[1:] - gps[:-1] > 2000))
    first = np.flatnonzero(brk)
    nseeds = np.diff(np.r_[first, len(order)])
    c_ex, c_ct, c_fwd = exs[first], cts[first], rls[first]
    c_g, c_q = gps[first], qps[first]

    L = qlen_of[c_ex].astype(np.int64)
    keep = ~((nseeds < min_seeds) & (L > 4 * min_frag_len))
    clen = (genomes.contig_offset[c_ct + 1]
            - genomes.contig_offset[c_ct])
    a = np.where(c_fwd, c_g - c_q - slack,
                 c_g + index.k + c_q + slack - L - 2 * slack)
    b = a + L + 2 * slack
    a = np.maximum(a, 0)
    b = np.minimum(b, clen)
    keep &= (b - a) >= np.minimum(min_frag_len, L)
    probe_windows: set = set()
    _t_xd = _time.perf_counter()
    # floors <= 26 provably drop nothing (the anchor diagonal contains
    # the exact 13-mer seed scoring 26), so the Kadane pass only runs
    # for lossy user floors — at the exact default it is a no-op
    # (computing it anyway was 11 s at the 100-genome rung, round 4)
    if xdrop_floor > 2 * index.k and keep.any():
        # ungapped pre-extension on the anchor seed's diagonal (see
        # docstring); exact substitution scores, fully vectorized: strip
        # tokens for ALL candidates come from one concatenated gather
        # (the round-3 per-candidate python slice+revcomp loop was part
        # of the 78 s map_t_seed_chain wall at 2000 genomes), then a
        # segmented Kadane pass scores every strip at once.
        kidx = np.flatnonzero(keep)
        dna = alphabet.dna_score_matrix().astype(np.int32)
        comp = alphabet.DNA_COMPLEMENT
        Lc_k = clen[kidx].astype(np.int64)
        qlen_k = qlen_of[c_ex[kidx]].astype(np.int64)
        fwd_k = c_fwd[kidx]
        # rc-space diagonal: query j matches t_rc[d + j] where
        # t_rc[x] = comp(t[Lc-1-x]) and the seed k-mer starts at
        # rc position Lc - k - c_g
        d_k = np.where(fwd_k,
                       c_g[kidx].astype(np.int64) - c_q[kidx],
                       Lc_k - index.k - c_g[kidx] - c_q[kidx])
        j0 = np.maximum(0, -d_k)
        j1 = np.minimum(qlen_k, Lc_k - d_k)
        ns = np.maximum(j1 - j0, 0)
        live = ns > 0
        best = np.full(len(kidx), -100, np.int32)
        if live.any():
            li = np.flatnonzero(live)
            lens = ns[li]
            seg0 = np.cumsum(lens) - lens
            intra = (np.arange(int(lens.sum()), dtype=np.int64)
                     - np.repeat(seg0, lens))
            sub_off = np.asarray(sub.offset, np.int64)
            q_cat = sub.tokens[np.repeat(sub_off[c_ex[kidx[li]]]
                                         + j0[li], lens) + intra]
            coff = np.asarray(genomes.contig_offset, np.int64)
            cbase = coff[c_ct[kidx[li]]]
            # forward strip position d+j; reverse reads comp(t[Lc-1-d-j])
            t_f = np.repeat(cbase + d_k[li] + j0[li], lens) + intra
            t_r = (np.repeat(cbase + Lc_k[li] - 1 - d_k[li] - j0[li],
                             lens) - intra)
            fwd_rep = np.repeat(fwd_k[li], lens)
            tok = np.asarray(genomes.tokens)
            # indices are in range by construction (j0/j1 clamp to the
            # strip's intersection with the contig); np.where still
            # evaluates both gathers, so clamp the inactive side only
            t_f = np.where(fwd_rep, t_f, 0)
            t_r = np.where(fwd_rep, 0, t_r)
            tv = np.where(fwd_rep, tok[t_f], comp[tok[t_r]])
            best[li] = _ungapped_best_segmented(
                dna[q_cat.astype(np.int64), tv.astype(np.int64)], seg0)
        weak = best < xdrop_floor
        if weak.any() and xdrop_floor > 26:
            # runtime insurance for floors ABOVE the provably-lossless
            # 26 (round-4 verdict missing #3): a deterministic 1/17
            # sample of would-be-dropped windows still pays the full DP;
            # any qualifying hit from a probe means the floor is lossy
            # on THIS data and raises the loud map_xdrop_recovered
            # counter (checked after the hit filter below).
            wk = np.flatnonzero(weak)
            pr = wk[8::17][:256]   # deterministic; no probes below 9
            #                        weak windows (noise-fixture scale)
            for i in map(int, kidx[pr]):
                probe_windows.add(
                    (int(exemplar_ids[c_ex[i]]), int(c_ct[i]),
                     1 if c_fwd[i] else -1, int(a[i]), int(b[i])))
            weak[pr] = False
            metrics.add("map_xdrop_probes", len(pr))
        if weak.any():
            metrics.add("map_xdrop_dropped", int(weak.sum()))
            keep[kidx[weak]] = False
        if (~weak).any():
            metrics.low("map_xdrop_min_kept", int(best[~weak].min()))
    metrics.add("map_t_xdrop", _time.perf_counter() - _t_xd)
    cand_rows = sorted(set(
        (int(exemplar_ids[c_ex[i]]), int(c_ct[i]),
         1 if c_fwd[i] else -1, int(a[i]), int(b[i]))
        for i in np.flatnonzero(keep)))
    metrics.add("map_t_seed_chain", _time.perf_counter() - _t)
    _t = _time.perf_counter()
    if not cand_rows:
        return MapHits.concat([])

    # --- align candidates in width buckets --------------------------------
    # Windows are extracted and revcomp'd on the HOST: a 2048-row window
    # batch uploads in ~40 ms, while the device-side mega-gather variant
    # (indexing 2048 x width windows out of the 10^8-token genome array)
    # sat in the tunnel compiler for tens of minutes per shape.  Coarse
    # width buckets + two batch sizes keep the kernel shape count tiny,
    # launches enqueue asynchronously, fetches defer.
    widths = make_length_buckets(
        max(int(b - a) for (_, _, _, a, b) in cand_rows),
        base=512, growth=2.0)
    by_bucket: dict = {}
    for row in cand_rows:
        wbi = int(np.searchsorted(widths, row[4] - row[3], side="left"))
        by_bucket.setdefault(wbi, []).append(row)

    qw_all = max(_bucket_width(int(genes.length[
        [r[0] for r in cand_rows]].max())), band)
    scorer = sw.dna_scorer()
    # one stable callable per phase: launch_rows_sharded caches its
    # shard_map jit on (mesh, fn) identity
    launch_fn = functools.partial(sw.sw_banded_packed, scorer=scorer,
                                  gap_open=gap_open,
                                  gap_extend=gap_extend, band=band)
    launches = []
    results = []
    warmed: set = set()
    for wbi, rows in sorted(by_bucket.items()):
        width = int(widths[wbi])
        i = 0
        while i < len(rows):
            chunk_rows = rows[i:i + batch]
            # batch width folded into the name (same stale-grid guard as
            # ops/pairs.py): a --continue resume against a checkpoint
            # written under a different launch grid must MISS cleanly
            lname = f"b{width}x{batch}_{i}"
            cached = (launch_cache.load(lname)
                      if launch_cache is not None else None)
            metrics.add("map_windows", len(chunk_rows))
            if cached is not None:
                launches.append((chunk_rows, cached, None))
                i += batch
                continue
            P = _pad_pow2(len(chunk_rows), batch)
            qd = np.full((P, qw_all), alphabet.DNA_PAD, np.int8)
            td = np.full((P, width), alphabet.DNA_PAD, np.int8)
            for ri, (ex, ci, strand, a, b) in enumerate(chunk_rows):
                qt = genes.gene_tokens(ex)
                qd[ri, :len(qt)] = qt[:qw_all]
                wt = genomes.contig_tokens(ci)[a:b]
                if strand < 0:
                    wt = alphabet.revcomp(wt)
                td[ri, :len(wt)] = wt[:width]
            td = sw.prep_target_tokens(td)
            handle = launch_rows_sharded(mesh, launch_fn, qd, td)
            # first launch of a new shape syncs (compile-under-async-queue
            # wedges the tunnelled client; see ops/pairs.py)
            if (P, width) not in warmed:
                jax.block_until_ready(handle)
                warmed.add((P, width))
            copy_async(handle)
            launches.append((chunk_rows, handle, lname))
            metrics.add("sw_lane_cells", P * (qw_all + width - 1) * band)
            metrics.add("sw_launches", 1)
            i += batch
    metrics.add("map_t_launch", _time.perf_counter() - _t)
    _t = _time.perf_counter()

    for chunk_rows, handle, lname in launches:
        if isinstance(handle, dict):
            res = handle               # resumed from the launch cache
        else:
            res = sw.unpack_stats(fetch_np(handle), len(chunk_rows))
            if launch_cache is not None:
                launch_cache.store(lname, res)
        for ri, (ex, ci, strand, a, b) in enumerate(chunk_rows):
            if res["score"][ri] <= 0:
                continue
            alen = int(res["aln_len"][ri])
            ident = res["matches"][ri] / max(alen, 1)
            span = int(res["qend"][ri]) - int(res["qstart"][ri]) + 1
            # fragment minima: absolute bp (--match_frag_len) AND fraction
            # of the exemplar (--match_frag_prop)
            need = max(min_frag_len,
                       int(np.ceil(min_frag_prop * int(genes.length[ex]))))
            if ident < min_identity or span < need:
                continue
            ts, te = int(res["tstart"][ri]), int(res["tend"][ri])
            if strand > 0:
                gs, ge = a + ts, a + te
            else:
                gs, ge = b - 1 - te, b - 1 - ts
            if (ex, ci, strand, a, b) in probe_windows:
                # an x-drop probe produced a QUALIFYING hit: the floor
                # in force is lossy on this data — keep the hit, shout
                metrics.add("map_xdrop_recovered", 1)
                import logging
                logging.getLogger("peppan_tpu").warning(
                    "x-drop probe recovered a real hit (exemplar %d, "
                    "contig %d): xdrop_floor=%d is dropping qualifying "
                    "windows; lower it toward the lossless 26",
                    ex, ci, xdrop_floor)
            results.append((ex, int(genomes.contig_genome[ci]), ci,
                            gs, ge, strand, int(res["score"][ri]),
                            float(ident),
                            span / max(int(genes.length[ex]), 1)))

    metrics.add("map_t_fetch", _time.perf_counter() - _t)
    if not results:
        return MapHits.concat([])
    res_arr = sorted(results)
    hits = MapHits(
        exemplar=np.asarray([r[0] for r in res_arr], np.int32),
        genome=np.asarray([r[1] for r in res_arr], np.int32),
        contig=np.asarray([r[2] for r in res_arr], np.int32),
        start=np.asarray([r[3] for r in res_arr], np.int64),
        end=np.asarray([r[4] for r in res_arr], np.int64),
        strand=np.asarray([r[5] for r in res_arr], np.int8),
        score=np.asarray([r[6] for r in res_arr], np.int32),
        identity=np.asarray([r[7] for r in res_arr], np.float32),
        qcov=np.asarray([r[8] for r in res_arr], np.float32),
        stitched=np.zeros(len(res_arr), bool),
    )
    return dedup_and_stitch(hits, genes, stitch_gap)


def exhaustive_missing(genes: GeneStore, genomes: GenomeStore,
                       missing: dict, *, mesh=None, band: int = 128,
                       min_identity: float = 0.65, min_frag_len: int = 50,
                       min_frag_prop: float = 0.0, gap_open: int = 5,
                       gap_extend: int = 2, batch: int = 4096) -> MapHits:
    """Blastn-grade sensitivity fallback: exhaustive windowed sweep for
    (genome, group) combos that minimizer seeding left without a single
    candidate (SURVEY §5.7 tier-2 sequence tiling, §2.2 blastn row).

    For every missing combo the group's representative exemplar (both
    strands) sweeps across EVERY window of the genome via
    parallel.seqtile.best_windows — O(L x gene_len) DP cells per combo,
    the honest cost of seeding-free sensitivity, which is why this is an
    opt-in fallback (PipelineConfig.exhaustive_fallback) rather than the
    default path.  The winning window then gets one stats-mode pass for
    exact coordinates, and the hits merge through the same
    dedup_and_stitch as seeded hits.

    missing: {genome: [exemplar gene ids]} (pipeline._missing_combos).
    """
    from ..parallel import seqtile

    rows = []
    stats_jobs = []          # (ex, contig, strand, q_row, window_start)
    for genome in sorted(missing):
        all_ex = sorted({int(e) for e in missing[genome]})
        # chunk so nq stays on the fixed launch grid: the single-launch
        # form padded to the RAW job count when it exceeded `batch`,
        # giving every big fallback run a unique compile shape (tunnel
        # compiles run minutes) and silently defeating row sharding
        for e0 in range(0, len(all_ex), max(batch // 2, 1)):
            ex_ids = all_ex[e0:e0 + max(batch // 2, 1)]
            qw = max(_bucket_width(int(genes.length[ex_ids].max())), band)
            nq = 2 * len(ex_ids)
            nq_pad = _pad_pow2(nq, batch)
            q = np.full((nq_pad, qw), alphabet.DNA_PAD, np.int8)
            for i, ex in enumerate(ex_ids):
                t = genes.gene_tokens(ex)[:qw]
                q[2 * i, :len(t)] = t
                q[2 * i + 1, :len(t)] = alphabet.revcomp(t)
            metrics.add("exhaustive_combos", len(ex_ids))
            for ci in np.flatnonzero(
                    np.asarray(genomes.contig_genome) == genome):
                toks = genomes.contig_tokens(int(ci))
                wins = seqtile.window_long_target(toks, qw, band)
                metrics.add("sweep_windows", len(wins))
                metrics.add("exhaustive_cells",
                            nq_pad * len(wins) * (qw + wins.shape[1] - 1)
                            * band)
                score, widx = seqtile.best_windows(
                    q, wins, band=band, gap_open=gap_open,
                    gap_extend=gap_extend, batch=batch, mesh=mesh)
                for i, ex in enumerate(ex_ids):
                    for strand, row in ((1, 2 * i), (-1, 2 * i + 1)):
                        if widx[row] >= 0:
                            stats_jobs.append((ex, int(ci), strand, q[row],
                                               int(widx[row]) * band,
                                               wins[widx[row]], qw))
    if not stats_jobs:
        return MapHits.concat([])

    # one stats pass over all winning windows (width varies with the qw
    # bucket; group jobs by width to keep launch shapes on the grid)
    by_width: dict = {}
    for job in stats_jobs:
        by_width.setdefault((job[6], job[5].shape[0]), []).append(job)
    scorer = sw.dna_scorer()
    launch_fn = functools.partial(sw.sw_banded_packed, scorer=scorer,
                                  gap_open=gap_open,
                                  gap_extend=gap_extend, band=band)
    chunked = [(qw, wwidth, jobs[j0:j0 + batch])
               for (qw, wwidth), jobs in sorted(by_width.items())
               for j0 in range(0, len(jobs), batch)]
    for (qw, wwidth, jobs) in chunked:
        n = len(jobs)
        pad = _pad_pow2(n, batch)    # fixed grid: never the raw job count
        qd = np.full((pad, qw), alphabet.DNA_PAD, np.int8)
        td = np.full((pad, wwidth), sw.T_PAD, np.int8)
        for ri, (_ex, _ci, _st, qrow, _ws, win, _qw) in enumerate(jobs):
            qd[ri] = qrow
            td[ri] = win
        res = sw.unpack_stats(fetch_np(
            launch_rows_sharded(mesh, launch_fn, qd, td)), n)
        metrics.add("sw_lane_cells", pad * (qw + wwidth - 1) * band)
        metrics.add("sw_launches", 1)
        for ri, (ex, ci, strand, _qrow, ws, _win, _qw) in enumerate(jobs):
            if res["score"][ri] <= 0:
                continue
            alen = int(res["aln_len"][ri])
            ident = res["matches"][ri] / max(alen, 1)
            span = int(res["qend"][ri]) - int(res["qstart"][ri]) + 1
            need = max(min_frag_len,
                       int(np.ceil(min_frag_prop * int(genes.length[ex]))))
            if ident < min_identity or span < need:
                continue
            # windows stay forward-strand (the QUERY was revcomp'd for
            # minus hits), so window-local coords map straight through
            gs = ws + int(res["tstart"][ri])
            ge = ws + int(res["tend"][ri])
            rows.append((ex, int(genomes.contig_genome[ci]), ci, gs, ge,
                         strand, int(res["score"][ri]), float(ident),
                         span / max(int(genes.length[ex]), 1)))
    if not rows:
        return MapHits.concat([])
    rows.sort()
    return MapHits(
        exemplar=np.asarray([r[0] for r in rows], np.int32),
        genome=np.asarray([r[1] for r in rows], np.int32),
        contig=np.asarray([r[2] for r in rows], np.int32),
        start=np.asarray([r[3] for r in rows], np.int64),
        end=np.asarray([r[4] for r in rows], np.int64),
        strand=np.asarray([r[5] for r in rows], np.int8),
        score=np.asarray([r[6] for r in rows], np.int32),
        identity=np.asarray([r[7] for r in rows], np.float32),
        qcov=np.asarray([r[8] for r in rows], np.float32),
        stitched=np.zeros(len(rows), bool),
    )


def dedup_and_stitch(hits: MapHits, genes: GeneStore,
                     stitch_gap: int) -> MapHits:
    """Drop duplicate/contained same-exemplar hits; merge same-exemplar
    fragments on one contig/strand separated by <= stitch_gap.

    Also the frameshift-aware DIAMOND analog (SURVEY.md §2.2): protein
    hits of one exemplar that landed in different reading frames arrive
    as separate fragments and merge here into one disrupted region, as do
    mixed DNA+protein fragment pairs (uberBlast's cross-method HSP
    stitching) — the pipeline re-runs this pass after concatenating the
    protein-search hits.

    Stitching is for COMPLEMENTARY fragments of one disrupted copy; two
    near-full-length hits of the same exemplar (each qcov >= 0.8) are
    tandem paralog copies and must stay separate regions — merging them
    would destroy copy counting (HSP merging in uberBlast is colinear
    within one alignment, never copy concatenation)."""
    import time as _time
    _t = _time.perf_counter()
    TANDEM_QCOV = 0.8
    keep: list = []
    order = np.lexsort((-hits.score, hits.start, hits.strand.astype(int),
                        hits.contig, hits.exemplar))
    last: dict = {}
    rows = []
    for idx in order:
        key = (int(hits.exemplar[idx]), int(hits.contig[idx]),
               int(hits.strand[idx]))
        s, e = int(hits.start[idx]), int(hits.end[idx])
        merged = False
        if key in last:
            prev = rows[last[key]]
            if s <= prev["end"] + stitch_gap:
                if e <= prev["end"]:
                    continue               # contained duplicate
                if (prev["qcov"] >= TANDEM_QCOV
                        and float(hits.qcov[idx]) >= TANDEM_QCOV):
                    pass                   # tandem copies: keep separate
                else:
                    merged = True
            if merged:
                ln_new = e - max(s, prev["end"] + 1) + 1
                tot = prev["end"] - prev["start"] + 1 + ln_new
                prev["identity"] = (
                    prev["identity"] * (prev["end"] - prev["start"] + 1)
                    + float(hits.identity[idx]) * ln_new) / tot
                prev["end"] = e
                prev["score"] += int(hits.score[idx])
                prev["qcov"] = min(
                    1.0, prev["qcov"] + float(hits.qcov[idx]))
                prev["stitched"] = True
        if not merged:
            rows.append(dict(
                exemplar=key[0], genome=int(hits.genome[idx]),
                contig=key[1], start=s, end=e, strand=key[2],
                score=int(hits.score[idx]),
                identity=float(hits.identity[idx]),
                qcov=float(hits.qcov[idx]), stitched=False))
            last[key] = len(rows) - 1
    metrics.add("map_t_stitch", _time.perf_counter() - _t)
    if not rows:
        return MapHits.concat([])
    rows.sort(key=lambda r: (r["genome"], r["contig"], r["start"],
                             r["exemplar"]))
    return MapHits(
        exemplar=np.asarray([r["exemplar"] for r in rows], np.int32),
        genome=np.asarray([r["genome"] for r in rows], np.int32),
        contig=np.asarray([r["contig"] for r in rows], np.int32),
        start=np.asarray([r["start"] for r in rows], np.int64),
        end=np.asarray([r["end"] for r in rows], np.int64),
        strand=np.asarray([r["strand"] for r in rows], np.int8),
        score=np.asarray([r["score"] for r in rows], np.int32),
        identity=np.asarray([r["identity"] for r in rows], np.float32),
        qcov=np.asarray([r["qcov"] for r in rows], np.float32),
        stitched=np.asarray([r["stitched"] for r in rows], bool),
    )


def _bucket_width(n: int) -> int:
    buckets = make_length_buckets(max(n, 1))
    return int(buckets[np.searchsorted(buckets, n, side="left")])


def _pad_pow2(n: int, cap: int) -> int:
    small = min(256, cap)
    return small if n <= small else cap
