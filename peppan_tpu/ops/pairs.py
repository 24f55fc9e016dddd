"""Candidate-pair generation: minimizer join + batched SW verification.

This is the TPU-era replacement for PEPPAN's uberBlast self-comparison
(reference: PEPPA.py::get_similar_pairs + modules/uberBlast.py — mount empty
at build time; pipeline position per SURVEY.md §3.1 phase 4): instead of
blastn/diamond subprocess searches, genes that share a canonical minimizer
become candidate pairs, and each candidate is verified by the banded-SW
engine to produce exact identity/coverage.

Host side here is deliberately thin: sort-based hash join over the
minimizer table (numpy), with a repetitive-minimizer cap (groups larger
than `max_group` are skipped, minimap2-style) so pathological seeds cannot
blow up the pair list.  All alignment math runs on device.
"""

from __future__ import annotations

import dataclasses

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..io import alphabet
from ..io.tokens import GeneStore, make_length_buckets, pad_to_dense
from ..utils import metrics
from ..utils.fetch import copy_async, fetch_np
from . import minimizers, sw


@dataclasses.dataclass
class MinimizerTable:
    """Flat (hash, gene, pos, strand) minimizer table, hash-sorted.
    strand: forward-kmer-is-canonical bit (for genome mapping joins)."""
    hash: np.ndarray    # uint32[n]
    gene: np.ndarray    # int32[n]
    pos: np.ndarray     # int32[n]
    strand: np.ndarray  # bool[n]


def _eff_batch(n_rows: int, batch: int) -> int:
    """Launch width for one verification pass.  Through the tunnel each
    enqueued launch costs ~45-80 ms of dispatch latency regardless of
    size (BASELINE.md round-4 launch-overhead paragraph: doubling the
    batch at 91k pairs halved the launch count for -14% wall), so passes
    with >= 8*batch rows use 2*batch-row launches; small passes keep the
    configured width to avoid extra padded cells and new compile shapes.
    The grid stays fixed (256 / batch / 2*batch) — outputs are
    per-pair-independent, so batching never changes results."""
    return batch * 2 if n_rows >= batch * 8 else batch


def _pad_rows(n: int, batch: int) -> int:
    """Fixed launch sizes — exactly TWO per width (256 or `batch`): every
    distinct shape costs a compile, and tunnel compiles run minutes-scale,
    so wasted pad compute (~10 ms/launch) is far cheaper than shape
    variety."""
    small = min(256, batch)
    return small if n <= small else batch


def build_minimizer_table(store: GeneStore, k: int = 13, w: int = 8,
                          batch: int = 512,
                          m_per_gene: int = 0) -> MinimizerTable:
    """Sketch every gene (device, padded batches) -> host occurrence table.

    m_per_gene > 0 keeps only each gene's m smallest-hash minimizer
    occurrences (linclust's per-sequence k-mer subset), selected ON
    DEVICE via top_k (minimizers.sketch_topm) — bit-identical to the
    round-3 host path (full table + per-gene (hash, pos) rank < m) but
    with m*(4+4) fetch bytes/gene instead of the dense width*4 and host
    sorts over n*m rows instead of every occurrence (the measured
    clu_t_seed wall at 2000 genomes)."""
    n = store.n_genes
    if n == 0:
        z = np.zeros(0, np.uint32)
        return MinimizerTable(z, z.astype(np.int32), z.astype(np.int32),
                              z.astype(bool))
    buckets = make_length_buckets(int(store.length.max()))
    order = np.argsort(store.length, kind="stable")
    hs, gs, ps, ss = [], [], [], []
    i = 0
    while i < n:
        j = min(i + batch, n)
        idx = order[i:j]
        width = int(buckets[np.searchsorted(
            buckets, int(store.length[idx].max()), side="left")])
        rows_padded = _pad_rows(j - i, batch)
        dense = np.full((rows_padded, width), alphabet.DNA_PAD, np.int8)
        dense[:j - i] = pad_to_dense(store, idx, width)
        if m_per_gene:
            rows, cols, hv, sv = minimizers.sketch_topm(dense, k, w,
                                                        m_per_gene)
        else:
            rows, cols, hv, sv = minimizers.sketch_flagged(dense, k, w)
        keep = rows < j - i
        rows, cols = rows[keep], cols[keep]
        hs.append(hv[keep])
        gs.append(idx[rows].astype(np.int32))
        ps.append(cols.astype(np.int32))
        ss.append(sv[keep])
        i = j
    h = np.concatenate(hs)
    g = np.concatenate(gs)
    p = np.concatenate(ps)
    s = np.concatenate(ss)
    order = np.lexsort((g, h))
    return MinimizerTable(h[order], g[order], p[order], s[order])


def candidate_center_pairs(table: MinimizerTable, lengths: np.ndarray, *,
                           max_group: int = 10 ** 9) -> np.ndarray:
    """linclust-style candidates: each gene pairs with the CENTER (longest
    member, ties to smallest id) of every minimizer group it occurs in —
    O(group size) instead of O(group size^2).  mmseqs linclust's core trick
    (SURVEY.md §2.2): transitive cluster membership comes from union-find
    over verified member-center edges, so all-pairs emission is never
    needed for clustering.  Returns unique (a < b) int32[m, 2]."""
    h, g = table.hash, table.gene
    if len(h) == 0:
        return np.zeros((0, 2), np.int32)
    n = len(h)
    brk = np.r_[True, h[1:] != h[:-1]]
    seg_of = np.cumsum(brk) - 1
    starts = np.flatnonzero(brk)
    sizes = np.diff(np.r_[starts, n])
    # center of each group: max length, tie -> smallest gene id
    order = np.lexsort((g, -lengths[g].astype(np.int64), seg_of))
    centers = g[order[starts]]
    a = centers[seg_of].astype(np.int64)
    b = g.astype(np.int64)
    valid = (a != b) & (sizes[seg_of] <= max_group)
    a, b = a[valid], b[valid]
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    key = np.unique((lo << 32) | hi)
    return np.stack([(key >> 32).astype(np.int32),
                     (key & 0xFFFFFFFF).astype(np.int32)], axis=1)


def candidate_pairs(table: MinimizerTable, *, max_group: int = 64,
                    min_shared: int = 1) -> tuple:
    """Hash-join the minimizer table against itself.

    Returns (pairs int32[m, 2], shared int32[m], diag int32[m]) where
    pairs[:, 0] < pairs[:, 1], shared counts distinct shared minimizers and
    diag is the median (qpos - tpos) seed offset.  Deterministic: pairs
    sorted lexicographically.
    """
    h = table.hash
    empty = (np.zeros((0, 2), np.int32), np.zeros(0, np.int32),
             np.zeros(0, np.int32))
    if len(h) == 0:
        return empty
    # group boundaries over equal hashes (fully vectorized from here on —
    # this join runs over millions of minimizer occurrences at scale)
    n = len(h)
    starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
    seg_of = np.cumsum(np.r_[True, h[1:] != h[:-1]]) - 1
    sizes = np.diff(np.r_[starts, n])
    valid = (sizes >= 2) & (sizes <= max_group)
    # each occurrence pairs with every EARLIER occurrence of its group
    pos_in_grp = np.arange(n) - starts[seg_of]
    reps = np.where(valid[seg_of], pos_in_grp, 0)
    total = int(reps.sum())
    if total == 0:
        return empty
    right = np.repeat(np.arange(n), reps)
    left = (np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
            + np.repeat(starts[seg_of], reps))
    ga, gb = table.gene[left].astype(np.int64), table.gene[right].astype(np.int64)
    pa, pb = table.pos[left].astype(np.int64), table.pos[right].astype(np.int64)
    keep = ga != gb
    if not keep.any():
        return empty
    swap = ga > gb
    a = np.where(swap, gb, ga)[keep]
    b = np.where(swap, ga, gb)[keep]
    d = np.where(swap, pb - pa, pa - pb)[keep].astype(np.int32)
    key = (a << 32) | b
    order = np.lexsort((d, key))        # diag-sorted within each pair key
    key, d = key[order], d[order]
    starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
    counts = np.diff(np.r_[starts, len(key)])
    diag = d[starts + (counts - 1) // 2]      # median of sorted segment
    ukey = key[starts]
    pairs = np.stack([(ukey >> 32).astype(np.int32),
                      (ukey & 0xFFFFFFFF).astype(np.int32)], axis=1)
    shared = counts.astype(np.int32)
    keepm = shared >= min_shared
    return pairs[keepm], shared[keepm], diag[keepm]


@dataclasses.dataclass
class PairHits:
    """Verified alignments for candidate pairs (parallel arrays).

    Rows verified under a score prefilter (two-pass mode, see
    ``verify_pairs(prefilter=...)``) that fell below the certificate
    floor carry the exact pass-1 score but SENTINEL stats
    (matches = aln_len = 0, identity = qcov = tcov = 0); such rows are
    provably below the prefilter's thresholds, so every downstream
    identity/coverage filter makes the same decision it would have made
    on exact stats.  ``prefiltered_rows`` identifies them (a real
    alignment with score > 0 always has aln_len >= 1)."""
    pairs: np.ndarray      # int32[m, 2]
    score: np.ndarray      # int32[m]
    identity: np.ndarray   # float32[m]  matches / aln_len
    qcov: np.ndarray       # float32[m]  aligned query span / query length
    tcov: np.ndarray       # float32[m]
    matches: np.ndarray    # int32[m]
    aln_len: np.ndarray    # int32[m]


def prefiltered_rows(hits: PairHits) -> np.ndarray:
    """bool[m]: rows whose stats are prefilter sentinels (score known,
    exact stats not computed)."""
    return (hits.score > 0) & (hits.aln_len == 0)


@dataclasses.dataclass(frozen=True)
class Prefilter:
    """Thresholds backing the two-pass score certificates (both sides).

    FAIL side (round 3, one-sided): an alignment with identity >=
    min_identity and qualifying coverage has aln_len = L >= Lmin, at
    least ceil(I*L) match columns (+match each) and at most (1-I)*L
    non-match columns, each costing at most
    pen = max(-mismatch, gap_open + gap_extend) (a mismatch, or a
    length-1 gap paying open+extend; longer gaps amortize cheaper).  So
    its score >= (match*I - pen*(1-I)) * Lmin.  If the banded-SW maximum
    over the whole pair is below that floor, NO such alignment exists —
    in particular the reported max-score alignment fails the thresholds,
    and the pair's downstream decision is FAIL regardless of its exact
    stats.  FAIL certificates only prune (coef > 0 needs
    I > pen/(match+pen), e.g. > 7/9 for 2/-3/5/2); below that the FAIL
    side is silently skipped.

    PASS side (round 4, SURVEY §7.3.3 two-sided pruning): from the EXACT
    maximum score S of pass 1, bounds on ANY maximum-score alignment:
      - every column contributes at most +match, so matches m >= S/match;
      - qspan >= m and tspan >= m (matches consume a position on each
        side), so qcov >= (S/match)/qlen, tcov >= (S/match)/tlen, and
        aln_len >= qspan >= S/match (for the --match_len escape);
      - every column consumes >= 1 of the two sequences and each match
        consumes 2, so L <= qlen + tlen - m <= qlen + tlen - S/match;
      - every non-match column costs at least gap_extend (mismatch costs
        -mismatch >= gap_extend for all production matrices — asserted),
        so S <= match*m - gap_extend*(L - m), i.e.
        identity = m/L >= (S/L + ext)/(match + ext), decreasing in L,
        hence >= (S/Lmax + ext)/(match + ext).
    If those lower bounds clear min_identity and the coverage rule, the
    reported alignment is guaranteed to PASS — exact stats cannot change
    the decision — and the stats DP is skipped.  Pass rows get sentinel
    identity/qcov/tcov = 1.0 with matches = aln_len = 0, so every
    downstream filter at THESE thresholds (or weaker) decides pass, and
    prefiltered_rows() still flags them for consumers that need values
    (e.g. cluster.split.estimate_divergence re-verifies them exactly).

    cov_mode 'both' = both sequences must reach their floor (mmseqs
    cov-mode 0, the cluster phase); 'max' = either side suffices
    (PEPPAN's --match_prop on max(qcov, tcov), the similarity phase).
    match_len > 0 adds the aln_len >= match_len coverage escape
    (PEPPAN --match_len).
    """
    min_identity: float
    min_qcov: float
    min_tcov: float
    cov_mode: str = "both"
    match_len: int = 0
    # PASS-side pruning is only a win when the caller consumes DECISIONS:
    # cluster-phase hits feed cluster.split.estimate_divergence, which
    # needs identity VALUES and re-verifies every sentinel row — pass
    # sentinels there would just move the same stats DP into the split
    # phase (measured +80k re-verified pairs at the 100-genome rung).
    two_sided: bool = True

    def floors(self, qlen: np.ndarray, tlen: np.ndarray, *, match: int,
               mismatch: int, gap_open: int,
               gap_extend: int) -> np.ndarray | None:
        pen = max(-mismatch, gap_open + gap_extend)
        coef = match * self.min_identity - pen * (1.0 - self.min_identity)
        if coef <= 0:
            return None
        if self.cov_mode == "both":
            lmin = np.maximum(self.min_qcov * qlen, self.min_tcov * tlen)
        else:   # 'max': either side qualifying -> the weaker bound rules
            lmin = np.minimum(self.min_qcov * qlen, self.min_tcov * tlen)
        if self.match_len > 0:
            # aln_len >= match_len is an alternative qualifying route
            lmin = np.minimum(lmin, float(self.match_len))
        return np.ceil(coef * lmin - 1e-6).astype(np.int32)

    def pass_certified(self, qlen: np.ndarray, tlen: np.ndarray,
                       score: np.ndarray, *, match: int, mismatch: int,
                       gap_open: int, gap_extend: int) -> np.ndarray:
        """bool[m]: rows whose pass-1 score PROVES the max-score
        alignment passes (identity, coverage) — see class docstring.
        Conservative: uncertifiable rows just fall through to stats."""
        ext = gap_extend
        if -mismatch < ext:
            # the identity bound needs every non-match column to cost
            # >= ext; not true for this matrix -> no pass certificates
            return np.zeros(len(score), bool)
        s = score.astype(np.float64)
        m_lb = s / match
        ql = qlen.astype(np.float64)
        tl = tlen.astype(np.float64)
        if self.cov_mode == "both":
            cov_ok = (m_lb >= self.min_qcov * ql) \
                & (m_lb >= self.min_tcov * tl)
        else:
            cov_ok = (m_lb >= self.min_qcov * ql) \
                | (m_lb >= self.min_tcov * tl)
        if self.match_len > 0:
            cov_ok |= m_lb >= self.match_len
        lmax = np.maximum(ql + tl - m_lb, 1.0)
        id_lb = (s / lmax + ext) / (match + ext)
        return (score > 0) & cov_ok & (id_lb >= self.min_identity + 1e-9)


@functools.partial(jax.jit, static_argnames=("scorer", "gap_open",
                                             "gap_extend", "band"))
def _gather_align(tokens, qidx, tidx, *, scorer, gap_open, gap_extend,
                  band):
    """Device-resident pair alignment: gather rows from the uploaded token
    store by index, remap the target side for the equality scorer, run the
    stats wavefront, return the packed (7, P) result.  Only small index
    vectors cross the host->device boundary per launch (the tunnelled TPU
    backend charges ~100 ms/MB for int8 uploads and ~150 ms flat per
    synchronous round-trip, so tokens stay resident and fetches defer)."""
    qd = jnp.take(tokens, qidx, axis=0)
    td = jnp.take(tokens, tidx, axis=0)
    td = jnp.where(td == 5, sw.T_PAD, jnp.where(td == 4, sw.T_N, td))
    res = sw.sw_banded(qd, td, scorer=scorer, gap_open=gap_open,
                       gap_extend=gap_extend, band=band, with_stats=True)
    return jnp.stack([res[k] for k in sw.STATS_KEYS])


_gather_shard_cache: dict = {}


def _gather_sharded(mesh, which, tokens_dev, qi, ti, *, scorer, gap_open,
                    gap_extend, band):
    """Run a _gather_scores/_gather_align launch under shard_map: the
    token store is replicated, the index vectors shard over the
    flattened ('data','db') axis, and each device traces the gather +
    alignment on its LOCAL index shard — so the Pallas fast paths
    inside ops.sw see local shapes and Mosaic custom calls never meet
    GSPMD's partitioner (see genome_map.launch_rows_sharded, the same
    manual-SPMD choice).  Non-divisible row counts fall back to the
    single-device launch with a `launch_shard_fallback` counter.

    ``which`` is 'scores' or 'align'; the shard_map-wrapped jit caches
    on (mesh, which, static scoring params) — NOT on a per-call partial
    — so repeat callers (the resplit loop invokes verify_pairs per
    conflicted group) reuse one compiled executable per launch shape."""
    inner, out_is_packed = (( _gather_scores, False) if which == "scores"
                            else (_gather_align, True))
    n_dev = len(mesh.devices.flat)
    if qi.shape[0] % n_dev:
        metrics.add("launch_shard_fallback", 1)
        return inner(tokens_dev, qi, ti, scorer=scorer, gap_open=gap_open,
                     gap_extend=gap_extend, band=band)
    key = (mesh, which, scorer, gap_open, gap_extend, band)
    sfn = _gather_shard_cache.get(key)
    if sfn is None:
        from jax.sharding import PartitionSpec as P
        fn = functools.partial(inner, scorer=scorer, gap_open=gap_open,
                               gap_extend=gap_extend, band=band)
        flat = P(("data", "db"))
        out_spec = P(None, ("data", "db")) if out_is_packed else flat
        sfn = jax.jit(jax.shard_map(
            fn, mesh=mesh, in_specs=(P(), flat, flat),
            out_specs=out_spec))
        _gather_shard_cache[key] = sfn
    return sfn(tokens_dev, qi, ti)


@functools.partial(jax.jit, static_argnames=("scorer", "gap_open",
                                             "gap_extend", "band"))
def _gather_scores(tokens, qidx, tidx, *, scorer, gap_open, gap_extend,
                   band):
    """Score-only variant of _gather_align — the two-pass prefilter's
    pass 1.  Dispatches to the Pallas v2 score kernel on TPU backends
    (~146 vs ~95 Gcell/s for the stats scan) and fetches one int32 per
    pair instead of seven."""
    qd = jnp.take(tokens, qidx, axis=0)
    td = jnp.take(tokens, tidx, axis=0)
    td = jnp.where(td == 5, sw.T_PAD, jnp.where(td == 4, sw.T_N, td))
    res = sw.sw_banded(qd, td, scorer=scorer, gap_open=gap_open,
                       gap_extend=gap_extend, band=band, with_stats=False)
    return res["score"]


def verify_pairs(store: GeneStore, pairs: np.ndarray, *, band: int = 128,
                 gap_open: int = 5, gap_extend: int = 2, batch: int = 4096,
                 match: int = 2, mismatch: int = -3, mesh=None,
                 shard_store: bool = False, launch_cache=None,
                 launch_tag: str = "vp",
                 prefilter: Prefilter | None = None) -> PairHits:
    """Align every candidate pair with banded SW (stats mode) on device.

    The padded token store is uploaded once; per batch only (P,) index
    vectors move host->device, all launches are enqueued back-to-back, and
    the packed results are fetched after the last dispatch (async overlap).
    Query is always the shorter gene (canonical orientation).

    With ``mesh`` and ``shard_store=True`` the store rows shard over the
    'db' axis instead of replicating (pod-memory mode — see
    parallel.allvsall.ShardedPairAligner); results are byte-identical to
    the replicated path.

    ``prefilter`` (a Prefilter) enables TWO-PASS verification: a
    score-only pass over all pairs first (Pallas v2 score kernel on TPU,
    ~1.5x the stats scan's cell rate, 1/7 the fetch bytes), then the
    stats pass only for pairs whose max score clears the certificate
    floor (see Prefilter — the certificate is one-sided and exact).
    Dropped pairs return sentinel stats (prefiltered_rows); callers that
    consume identity VALUES of sub-threshold pairs (not just threshold
    decisions) must re-verify those rows exactly — see
    cluster.split.estimate_divergence.

    ``launch_cache`` (utils.manifest.LaunchCache) gives the verification
    sweep launch-granular resume under --continue — the SURVEY §5.4 tile
    checkpointing for the cluster/similarity phases, same mechanism as
    genome_map's.  Launches are deterministic given the pair list, so the
    cache key is just (tag, batch offset); the owning phase's content hash
    binds the directory.  Ignored on the sharded-store path (pod-memory
    runs own their placement; a stale single-host layout must not leak).
    """
    m = len(pairs)
    pass_rows = np.zeros(m, bool)
    out_score = np.zeros(m, np.int32)
    out_match = np.zeros(m, np.int32)
    out_alen = np.zeros(m, np.int32)
    out_qspan = np.zeros(m, np.int32)
    out_tspan = np.zeros(m, np.int32)
    qlen = np.zeros(m, np.int64)
    tlen = np.zeros(m, np.int64)
    if m:
        la = store.length[pairs[:, 0]]
        lb = store.length[pairs[:, 1]]
        qidx = np.where(la <= lb, pairs[:, 0], pairs[:, 1])
        tidx = np.where(la <= lb, pairs[:, 1], pairs[:, 0])
        qlen = store.length[qidx].astype(np.int64)
        tlen = store.length[tidx].astype(np.int64)
        buckets = make_length_buckets(max(int(store.length.max()), band))
        width = int(buckets[np.searchsorted(
            buckets, max(int(store.length.max()), band), side="left")])
        dense = pad_to_dense(store, np.arange(store.n_genes), width)
        if mesh is not None and shard_store:
            from ..parallel.allvsall import ShardedPairAligner
            aligner = ShardedPairAligner(mesh, dense, band=band,
                                         gap_open=gap_open,
                                         gap_extend=gap_extend, batch=batch)
            ki = {k: i for i, k in enumerate(sw.STATS_KEYS)}
            for sel, slots, handle in aligner(qidx, tidx):
                packed = fetch_np(handle)
                out_score[sel] = packed[ki["score"], slots]
                out_match[sel] = packed[ki["matches"], slots]
                out_alen[sel] = packed[ki["aln_len"], slots]
                out_qspan[sel] = (packed[ki["qend"], slots]
                                  - packed[ki["qstart"], slots] + 1)
                out_tspan[sel] = (packed[ki["tend"], slots]
                                  - packed[ki["tstart"], slots] + 1)
            alen = np.maximum(out_alen, 1)
            return PairHits(
                pairs=np.asarray(pairs, np.int32),
                score=out_score,
                identity=(out_match / alen).astype(np.float32),
                qcov=(out_qspan / np.maximum(qlen, 1)).astype(np.float32),
                tcov=(out_tspan / np.maximum(tlen, 1)).astype(np.float32),
                matches=out_match,
                aln_len=out_alen,
            )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            tokens_dev = jax.device_put(dense, NamedSharding(mesh, P()))
            idx_sharding = NamedSharding(mesh, P(("data", "db")))
        else:
            tokens_dev = jax.device_put(dense)
            idx_sharding = None
        scorer = sw.dna_scorer(match, mismatch)
        import time as _time
        _t0 = _time.perf_counter()
        warmed: set = set()

        def put_idx(rows, rows_padded):
            qi = np.zeros(rows_padded, np.int32)
            ti = np.zeros(rows_padded, np.int32)
            qi[:len(rows)] = qidx[rows]
            ti[:len(rows)] = tidx[rows]
            if idx_sharding is not None:
                # data-parallel over the flattened mesh: pairs shard across
                # devices, the token store is replicated; jit inserts the
                # all-gather-free local gathers automatically
                qi = jax.device_put(qi, idx_sharding)
                ti = jax.device_put(ti, idx_sharding)
            return qi, ti

        floors = None
        if prefilter is not None:
            floors = prefilter.floors(qlen, tlen, match=match,
                                      mismatch=mismatch, gap_open=gap_open,
                                      gap_extend=gap_extend)
        todo = np.arange(m)
        pass_rows = np.zeros(m, bool)
        if prefilter is not None:
            # pass 1: score-only sweep over ALL pairs (Pallas score kernel
            # on TPU); pairs below their certificate floor are decided
            # FAIL here, pairs whose score PROVES the thresholds are
            # decided PASS (two-sided, round 4) — both skip the (slower)
            # stats pass entirely
            launches1 = []
            eff1 = _eff_batch(m, batch)
            i = 0
            while i < m:
                j = min(i + eff1, m)
                sel = np.arange(i, j)
                # the launch width is part of the name: a --continue resume
                # against a checkpoint written under a different grid
                # (e.g. pre-_eff_batch code) must MISS cleanly, not load a
                # 512-row cached result for a 1024-row sel
                lname = f"{launch_tag}s{eff1}_{i}"
                cached = (launch_cache.load(lname)
                          if launch_cache is not None else None)
                if cached is not None:
                    launches1.append((sel, cached, None))
                    i = j
                    continue
                rows_padded = _pad_rows(len(sel), eff1)
                qi, ti = put_idx(sel, rows_padded)
                if mesh is not None:
                    handle = _gather_sharded(
                        mesh, "scores", tokens_dev, qi, ti, scorer=scorer,
                        gap_open=gap_open, gap_extend=gap_extend, band=band)
                else:
                    handle = _gather_scores(
                        tokens_dev, qi, ti, scorer=scorer, gap_open=gap_open,
                        gap_extend=gap_extend, band=band)
                if ("s", rows_padded) not in warmed:
                    jax.block_until_ready(handle)
                    warmed.add(("s", rows_padded))
                copy_async(handle)
                launches1.append((sel, handle, lname))
                metrics.add("sw_lane_cells",
                            rows_padded * (2 * width - 1) * band)
                metrics.add("vp_cells_score",
                            rows_padded * (2 * width - 1) * band)
                metrics.add("sw_launches", 1)
                i = j
            for sel, handle, lname in launches1:
                if isinstance(handle, dict):
                    res1 = handle
                else:
                    res1 = {"score": fetch_np(handle)[:len(sel)]}
                    if launch_cache is not None:
                        launch_cache.store(lname, res1)
                out_score[sel] = res1["score"]
            alive = (out_score >= floors) if floors is not None \
                else np.ones(m, bool)
            if prefilter.two_sided:
                pass_rows = alive & prefilter.pass_certified(
                    qlen, tlen, out_score, match=match, mismatch=mismatch,
                    gap_open=gap_open, gap_extend=gap_extend)
            todo = np.flatnonzero(alive & ~pass_rows)
            metrics.add("vp_prefiltered", int((~alive).sum()))
            metrics.add("vp_pass_certified", int(pass_rows.sum()))
            metrics.add("sw_pairs", m)

        # pass 2 (or the only pass): full stats for surviving pairs
        launches = []
        eff2 = _eff_batch(len(todo), batch)
        i = 0
        while i < len(todo):
            j = min(i + eff2, len(todo))
            sel = todo[i:j]
            # width folded into the name (see pass-1 comment): stale-grid
            # checkpoints miss instead of shape-mismatching at out[sel] =
            lname = f"{launch_tag}v{eff2}_{i}" if prefilter is not None \
                else f"{launch_tag}w{eff2}_{i}"
            cached = (launch_cache.load(lname)
                      if launch_cache is not None else None)
            if cached is not None:
                launches.append((sel, cached, None))
                i = j
                continue
            rows_padded = _pad_rows(len(sel), eff2)
            qi, ti = put_idx(sel, rows_padded)
            if mesh is not None:
                handle = _gather_sharded(
                    mesh, "align", tokens_dev, qi, ti, scorer=scorer,
                    gap_open=gap_open, gap_extend=gap_extend, band=band)
            else:
                handle = _gather_align(tokens_dev, qi, ti, scorer=scorer,
                                       gap_open=gap_open,
                                       gap_extend=gap_extend, band=band)
            # block on the FIRST launch of each new kernel shape: issuing a
            # compile with a deep async queue wedges the tunnelled client
            # (observed: same shape compiles in 30 s fresh, 20+ min queued)
            if rows_padded not in warmed:
                jax.block_until_ready(handle)
                warmed.add(rows_padded)
            copy_async(handle)
            launches.append((sel, handle, lname))
            if prefilter is None:
                metrics.add("sw_pairs", len(sel))
            metrics.add("sw_lane_cells",
                        rows_padded * (2 * width - 1) * band)
            metrics.add("vp_cells_stats",
                        rows_padded * (2 * width - 1) * band)
            metrics.add(f"vp_cells_stats_{launch_tag}",
                        rows_padded * (2 * width - 1) * band)
            metrics.add("sw_launches", 1)
            i = j
        for sel, handle, lname in launches:
            if isinstance(handle, dict):
                res = handle           # resumed from the launch cache
            else:
                res = sw.unpack_stats(fetch_np(handle), len(sel))
                if launch_cache is not None:
                    launch_cache.store(lname, res)
            out_score[sel] = res["score"]
            out_match[sel] = res["matches"]
            out_alen[sel] = res["aln_len"]
            out_qspan[sel] = res["qend"] - res["qstart"] + 1
            out_tspan[sel] = res["tend"] - res["tstart"] + 1
        metrics.add("vp_seconds", _time.perf_counter() - _t0)
    alen = np.maximum(out_alen, 1)
    identity = (out_match / alen).astype(np.float32)
    qcov = (out_qspan / np.maximum(qlen, 1)).astype(np.float32)
    tcov = (out_tspan / np.maximum(tlen, 1)).astype(np.float32)
    if pass_rows.any():
        # PASS-certified sentinels: any threshold <= the certificate's
        # decides pass; matches/aln_len stay 0 so prefiltered_rows()
        # still flags these rows for value-consumers to re-verify
        identity[pass_rows] = 1.0
        qcov[pass_rows] = 1.0
        tcov[pass_rows] = 1.0
    return PairHits(
        pairs=np.asarray(pairs, np.int32),
        score=out_score,
        identity=identity,
        qcov=qcov,
        tcov=tcov,
        matches=out_match,
        aln_len=out_alen,
    )
