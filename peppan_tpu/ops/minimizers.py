"""k-mer minimizer sketching — the seeding stage of the alignment engine.

Replaces the seeding machinery of PEPPAN's external tools (blastn 11-mer
lookup, MMseqs2 k-mer prefilter, DIAMOND double indexing; SURVEY.md §2.2)
with one uniform device-side primitive: w-window minimizers of canonical
2-bit-packed k-mers, computed as fully vectorized int32 ops over padded
(batch, length) token matrices — no data-dependent shapes.

Downstream consumers:
  - cluster/linclust: genes sharing a minimizer become candidate cluster
    edges, verified by banded SW;
  - self-comparison and genome mapping: shared minimizers seed (query,
    target, diagonal) candidate tuples for the tile engine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

INVALID_HASH = np.uint32(0xFFFFFFFF)


def _mix32(x: jax.Array) -> jax.Array:
    """murmur3 finalizer — invertible uint32 mixing."""
    x = x ^ (x >> 16)
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * np.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


@functools.partial(jax.jit, static_argnames=("k",))
def kmer_hashes(tokens: jax.Array, k: int = 15) -> tuple:
    """Canonical k-mer hashes at every position of padded token rows.

    tokens: int8[P, L] DNA tokens (PAD/N >= 4 invalidate overlapping k-mers)
    Returns (hash uint32[P, L], strand bool[P, L]); positions whose k-mer
    window runs past L or contains non-ACGT get INVALID_HASH.  strand is
    True where the forward k-mer is the canonical one.
    """
    if not 1 <= k <= 16:
        raise ValueError("k must be in [1, 16]")
    P, L = tokens.shape
    t = tokens.astype(jnp.uint32)
    bad = (t >= 4)
    tc = (3 - t) % 4  # complement (garbage where bad; masked below)

    def lshift(a, j, fill):
        # a[:, j:] padded at the end — static slice, cheap to compile on TPU
        # (jnp.roll lowers poorly on the mosaic backend)
        if j == 0:
            return a
        return jnp.concatenate(
            [a[:, j:], jnp.full((P, j), fill, a.dtype)], axis=1)

    fwd = jnp.zeros((P, L), jnp.uint32)
    rc = jnp.zeros((P, L), jnp.uint32)
    anybad = jnp.zeros((P, L), dtype=bool)
    for j in range(k):
        fwd = fwd | (lshift(t, j, 0) << np.uint32(2 * (k - 1 - j)))
        rc = rc | (lshift(tc, j, 0) << np.uint32(2 * j))
        anybad = anybad | lshift(bad, j, True)
    pos = jax.lax.broadcasted_iota(jnp.int32, (P, L), 1)
    invalid = anybad | (pos > L - k)
    strand = fwd <= rc
    canon = jnp.minimum(fwd, rc)
    h = _mix32(canon)
    # reserve INVALID_HASH: valid hashes clamp to 0xFFFFFFFE
    h = jnp.minimum(h, np.uint32(0xFFFFFFFE))
    return jnp.where(invalid, INVALID_HASH, h), strand


@functools.partial(jax.jit, static_argnames=("w",))
def minimizer_flags(hashes: jax.Array, w: int = 10) -> jax.Array:
    """Leftmost-min w-window minimizer flags.

    hashes: uint32[P, L].  A position p is flagged iff it is the leftmost
    minimum of at least one window of w consecutive k-mer positions.
    Deterministic by construction (SURVEY.md §4.2.3).
    """
    P, L = hashes.shape

    def lshift(a, j, fill):
        if j == 0:
            return a
        return jnp.concatenate(
            [a[:, j:], jnp.full((P, j), fill, a.dtype)], axis=1)

    def rshift(a, j, fill):
        if j == 0:
            return a
        return jnp.concatenate(
            [jnp.full((P, j), fill, a.dtype), a[:, :-j]], axis=1)

    # stacked shifted views: shifted[j][:, s] = h[s + j] (INVALID off-end)
    shifted = jnp.stack(
        [lshift(hashes, j, INVALID_HASH) for j in range(w)], axis=0)
    pos = jax.lax.broadcasted_iota(jnp.int32, (P, L), 1)
    wmin = jnp.min(shifted, axis=0)                      # [P, L] per start s
    off = jnp.argmin(shifted, axis=0).astype(jnp.int32)  # leftmost min
    valid_win = (wmin != INVALID_HASH) & (pos <= L - w)
    # scatter-free: p is flagged iff some window starting at s = p - j picked
    # offset j; express as w shifted compares (TPU-friendly, no scatter)
    flags = jnp.zeros((P, L), dtype=bool)
    for j in range(w):
        flags = flags | rshift((off == j) & valid_win, j, False)
    return flags


def sketch_batch(tokens: np.ndarray, k: int = 15, w: int = 10) -> tuple:
    """Host convenience: (hashes, strand, flags) for one padded batch."""
    h, s = kmer_hashes(jnp.asarray(tokens), k)
    f = minimizer_flags(h, w)
    return np.asarray(h), np.asarray(s), np.asarray(f)


@functools.partial(jax.jit, static_argnames=("k", "w"))
def _sketch_flagged_dev(tokens: jax.Array, k: int, w: int) -> jax.Array:
    h, s = kmer_hashes(tokens, k)
    f = minimizer_flags(h, w)
    # fold the strand bit into hash bit 0; non-minimizer positions invalid.
    # ONE uint32 array comes back to the host: each device->host fetch has
    # ~25 ms flat latency on the tunnelled backend, so fetch count matters.
    packed = (h & np.uint32(0xFFFFFFFE)) | s.astype(jnp.uint32)
    return jnp.where(f, packed, INVALID_HASH)


def sketch_flagged(tokens: np.ndarray, k: int = 15, w: int = 10) -> tuple:
    """(rows, cols, hash, strand) of minimizer positions, chunk-fetched.
    hash has bit 0 cleared (joins must compare this masked value)."""
    from ..utils.fetch import fetch_np
    packed = fetch_np(_sketch_flagged_dev(jnp.asarray(tokens), k, w))
    rows, cols = np.nonzero(packed != INVALID_HASH)
    v = packed[rows, cols]
    return rows, cols, v & np.uint32(0xFFFFFFFE), (v & 1).astype(bool)


# --- top-m compacted sketch ---------------------------------------------------
# linclust's per-sequence m-kmer subset (SURVEY §2.2 mmseqs row), selected
# ON DEVICE: per row, the m minimizer occurrences with the smallest MASKED
# hash (ties -> leftmost position, matching the host rank's stable
# (hash, pos) order).  Replaces the round-3 host path (dense (P, L) sketch
# fetch + 68M-row lexsort at L4, the measured clu_t_seed wall): the fetch
# shrinks from L*4 to m*(4+4) bytes/row and every downstream host sort
# runs on n_genes*m rows instead of all minimizer occurrences.


@functools.partial(jax.jit, static_argnames=("k", "w", "m"))
def _sketch_topm_dev(tokens: jax.Array, k: int, w: int, m: int) -> tuple:
    h, s = kmer_hashes(tokens, k)
    f = minimizer_flags(h, w)
    hm = h & np.uint32(0xFFFFFFFE)
    packed = hm | s.astype(jnp.uint32)
    # order-preserving signed view of the masked hash; non-minimizers get
    # int32 max so they sort last (a real masked hash maps to at most
    # 0x7FFFFFFE, so the sentinel is unambiguous)
    key = jax.lax.bitcast_convert_type(hm ^ np.uint32(0x80000000),
                                       jnp.int32)
    key = jnp.where(f, key, jnp.int32(2 ** 31 - 1))
    m = min(m, key.shape[1])
    negk, idx = jax.lax.top_k(-key, m)   # m smallest; ties -> lower index
    valid = negk != -(2 ** 31 - 1)
    hsel = jnp.take_along_axis(packed, idx, axis=1)
    hsel = jnp.where(valid, hsel, INVALID_HASH)
    return hsel, idx.astype(jnp.int32)


def sketch_topm(tokens: np.ndarray, k: int = 15, w: int = 10,
                m: int = 20) -> tuple:
    """(rows, cols, hash, strand) of each row's m smallest-hash minimizer
    occurrences — bit-identical to ranking sketch_flagged's output by
    (masked hash, position) per row and keeping rank < m."""
    from ..utils.fetch import fetch_np
    hsel, cols = _sketch_topm_dev(jnp.asarray(tokens), k, w, m)
    hsel = fetch_np(hsel)
    cols = fetch_np(cols)
    valid = hsel != INVALID_HASH
    rows, slot = np.nonzero(valid)
    v = hsel[rows, slot]
    return (rows, cols[rows, slot], v & np.uint32(0xFFFFFFFE),
            (v & 1).astype(bool))


# --- membership-filtered compacted sketch ------------------------------------
# The tunnelled backend fetches ~16 MB/s, so the dense uint32[P, L] sketch
# result (1 s per 512x8192 launch) dominates the sketch phases.  When the
# caller knows the QUERY hash set it will join against, the device can
# drop non-matching minimizers (a bloom-bitmask membership test on the
# hash's top bits — false positives only add rows the host join discards,
# so join OUTPUT is bit-identical) and compact survivors to a fixed
# per-row cap via top_k, fetching cap*(4+4) bytes/row instead of L*4.
# Rows that overflow the cap are detected exactly (per-row counts come
# back too) and the affected launch refetches through the dense path.

BLOOM_BITS_DNA = 24     # 2 MB bitmask upload, ~4% fp at 750k query hashes
BLOOM_BITS_AA = 22      # 512 KB, ~5% fp at 200k query hashes


def make_hash_bloom(hashes: np.ndarray, bits: int) -> np.ndarray:
    """uint32[2^bits/32] one-bit membership table over hash TOP bits.

    Top bits are strand-insensitive for the DNA packing (strand lives in
    bit 0) and uniform for murmur-mixed hashes."""
    idx = (np.asarray(hashes, np.uint32).astype(np.uint64)
           >> np.uint64(32 - bits)).astype(np.int64)
    bm = np.zeros(1 << (bits - 5), np.uint32)
    np.bitwise_or.at(bm, idx >> 5,
                     (np.uint32(1) << (idx & 31).astype(np.uint32)))
    return bm


@functools.partial(jax.jit,
                   static_argnames=("k", "w", "cap", "bits", "protein"))
def _sketch_matched_dev(tokens: jax.Array, bloom: jax.Array, *, k: int,
                        w: int, cap: int, bits: int,
                        protein: bool) -> tuple:
    """(packed int32[2, P, cap], counts int32[P]) — packed[0] is the
    bitcast hash (INVALID_HASH slots marked), packed[1] the column.
    Hash and column ride ONE array so the host fetch is a single
    transfer (each synchronous round trip through the tunnel is
    ~150 ms; the old (hsel, cols) pair cost two)."""
    if protein:
        h = aa_kmer_hashes(tokens, k)
        packed = h
    else:
        h, s = kmer_hashes(tokens, k)
        packed = (h & np.uint32(0xFFFFFFFE)) | s.astype(jnp.uint32)
    f = minimizer_flags(h, w)
    idx = (h >> np.uint32(32 - bits)).astype(jnp.int32)
    word = jnp.take(bloom, idx >> 5)
    member = ((word >> (idx & 31).astype(jnp.uint32)) & 1) == 1
    keep = f & member            # flagged positions always have valid h
    P, L = h.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (P, L), 1)
    key = jnp.where(keep, pos, L + 1)
    negk, _ = jax.lax.top_k(-key, cap)
    cols = -negk                 # ascending matched positions; L+1 = none
    safe = jnp.clip(cols, 0, L - 1)
    hsel = jnp.take_along_axis(packed, safe, axis=1)
    hsel = jnp.where(cols <= L - 1, hsel, INVALID_HASH)
    counts = keep.sum(axis=1).astype(jnp.int32)
    out = jnp.stack([jax.lax.bitcast_convert_type(hsel, jnp.int32),
                     cols.astype(jnp.int32)])
    return out, counts


def fetch_slots(cap: int, counts: np.ndarray) -> int:
    """Slot count to FETCH for a compacted (rows, cap) result: the pow2
    round-up of the observed per-row maximum (floor 64).  The device
    compaction pads every row to `cap`, but fetching the full cap was
    the measured wall at scale (cap 4096 * 512 rows * 8 B = 16.7 MB per
    launch at ~16 MB/s through the tunnel, vs a typical row max of a few
    hundred) — slicing on device costs one tiny cached compile per
    distinct pow2."""
    cmax = int(counts.max()) if len(counts) else 0
    K = 64
    while K < cmax:
        K <<= 1
    return min(K, cap)


from ..utils.fetch import copy_async as _async_copy


class MatchedSketchPipeline:
    """Launch -> slice -> decode pipeline for matched sketches.

    The tunnelled backend charges ~150 ms per synchronous device round
    trip, and the synchronous drain paid three per 512-row flush (counts
    fetch, then hash + column fetches) — measured as the round-4
    pmap_t_sketch / map_t_index walls at 2000 genomes (154 s / 89 s).
    This pipeline (a) moves hash+col in ONE packed transfer
    (_sketch_matched_dev), (b) starts each transfer with
    copy_to_host_async at the earliest stage that knows its shape, and
    (c) runs the slice and decode stages `lag` flushes behind the launch
    front so every round trip overlaps later flushes' compute/copies.

    Results are bit-identical to the synchronous path: stage order per
    flush is unchanged, and flushes whose row count overflows `cap` fall
    back to the dense sketch of their kept buffer exactly as before.

    Memory bound per in-flight entry (callers picking ``lag`` must
    budget this): the pipeline holds up to ``lag + 1`` launched entries
    AND ``lag + 1`` sliced entries at once, each pinning its dense host
    buffer (rows x width int8) plus a (2, rows, cap) int32 device array
    — ~16.7 MB at the DNA defaults (512 rows x cap 4096).  Total bound
    ~= 2 * (lag + 1) * (8 * rows * cap + rows * width) bytes; the
    default lag=4 keeps ~10 entries (~170 MB device) in flight.  Raise
    lag or cap only with that product in mind.
    """

    def __init__(self, bloom_dev, *, k: int, w: int, cap: int, bits: int,
                 protein: bool, lag: int = 4):
        self.bloom = bloom_dev
        self.k, self.w, self.cap, self.bits = k, w, cap, bits
        self.protein = protein
        self.lag = lag
        self._launched: list = []   # (packed, counts, dense, meta)
        self._sliced: list = []     # (slice | None, dense, meta)
        self._done: list = []       # (meta, decoded tuple)

    def push(self, dense: np.ndarray, meta=None) -> list:
        """Enqueue one flush; returns any flushes that completed."""
        packed, counts = _sketch_matched_dev(
            jnp.asarray(dense), self.bloom, k=self.k, w=self.w,
            cap=self.cap, bits=self.bits, protein=self.protein)
        _async_copy(counts)
        self._launched.append((packed, counts, dense, meta))
        if len(self._launched) > self.lag:
            self._slice_one()
        if len(self._sliced) > self.lag:
            self._decode_one()
        out, self._done = self._done, []
        return out

    def finish(self) -> list:
        """Drain every in-flight flush; returns the remaining results."""
        while self._launched:
            self._slice_one()
        while self._sliced:
            self._decode_one()
        out, self._done = self._done, []
        return out

    def _slice_one(self) -> None:
        from ..utils import metrics
        packed, counts, dense, meta = self._launched.pop(0)
        counts = np.asarray(counts)
        if (counts > self.cap).any():
            metrics.add("sketch_match_overflows", 1)
            self._sliced.append((None, dense, meta))
            return
        sl = packed[:, :, :fetch_slots(self.cap, counts)]
        _async_copy(sl)
        self._sliced.append((sl, dense, meta))

    def _decode_one(self) -> None:
        from ..utils import metrics
        sl, dense, meta = self._sliced.pop(0)
        if sl is None:           # overflow: dense fallback, same as ever
            if self.protein:
                self._done.append((meta, aa_sketch_flagged(
                    dense, self.k, self.w)))
            else:
                self._done.append((meta, sketch_flagged(
                    dense, self.k, self.w)))
            return
        arr = np.asarray(sl)
        hsel = arr[0].view(np.uint32)
        cols = arr[1]
        valid = hsel != INVALID_HASH
        rows, slot = np.nonzero(valid)
        c = cols[rows, slot]
        v = hsel[rows, slot]
        metrics.add("sketch_match_rows", int(len(rows)))
        if self.protein:
            self._done.append((meta, (rows, c, v)))
        else:
            self._done.append((meta, (rows, c, v & np.uint32(0xFFFFFFFE),
                                      (v & 1).astype(bool))))


def sketch_flagged_matched(tokens: np.ndarray, bloom_dev, *, k: int = 15,
                           w: int = 10, cap: int = 4096,
                           bits: int = BLOOM_BITS_DNA) -> tuple:
    """DNA sketch restricted to minimizers whose hash top bits appear in
    the query bloom; exact w.r.t. any downstream equi-join on the query
    set (see module comment).  Falls back to sketch_flagged on overflow."""
    pipe = MatchedSketchPipeline(bloom_dev, k=k, w=w, cap=cap, bits=bits,
                                 protein=False, lag=0)
    (_, out), = pipe.push(np.asarray(tokens)) + pipe.finish()
    return out


def aa_sketch_flagged_matched(tokens: np.ndarray, bloom_dev, *, k: int = 7,
                              w: int = 6, cap: int = 1024,
                              bits: int = BLOOM_BITS_AA) -> tuple:
    """Protein counterpart of sketch_flagged_matched."""
    pipe = MatchedSketchPipeline(bloom_dev, k=k, w=w, cap=cap, bits=bits,
                                 protein=True, lag=0)
    (_, out), = pipe.push(np.asarray(tokens)) + pipe.finish()
    return out


# --- protein (reduced-alphabet) sketching ------------------------------------
# Murphy-10 reduction of the 20-letter alphabet: groups statistically
# exchangeable residues so seeds survive conservative substitutions — the
# same sensitivity trick as DIAMOND's reduced-alphabet double indexing
# (SURVEY.md §2.2).  Our AA token order is alphabet.AA_ALPHA
# ("ACDEFGHIKLMNPQRSTVWY"); X/STOP/PAD map to group 15 (invalid marker).

_MURPHY10_GROUPS = ["LVIM", "C", "A", "G", "ST", "P", "FYW", "EDNQ", "KR",
                    "H"]
MURPHY10 = np.full(32, 15, dtype=np.int8)
for _gi, _grp in enumerate(_MURPHY10_GROUPS):
    for _c in _grp:
        MURPHY10["ACDEFGHIKLMNPQRSTVWY".index(_c)] = _gi


@functools.partial(jax.jit, static_argnames=("k",))
def aa_kmer_hashes(tokens: jax.Array, k: int = 7) -> jax.Array:
    """Reduced-alphabet protein k-mer hashes (4 bits/residue, k <= 8).

    tokens: int8[P, L] AA tokens.  No reverse-complement canonicalization
    (proteins are directional).  Positions whose window contains X/STOP/PAD
    or runs off the row get INVALID_HASH.
    """
    if not 1 <= k <= 8:
        raise ValueError("protein k must be in [1, 8]")
    P, L = tokens.shape
    red = jnp.take(jnp.asarray(MURPHY10), jnp.clip(tokens, 0, 31).astype(
        jnp.int32)).astype(jnp.uint32)
    bad = red >= 10

    def lshift(a, j, fill):
        if j == 0:
            return a
        return jnp.concatenate(
            [a[:, j:], jnp.full((P, j), fill, a.dtype)], axis=1)

    packed = jnp.zeros((P, L), jnp.uint32)
    anybad = jnp.zeros((P, L), dtype=bool)
    for j in range(k):
        packed = packed | (lshift(red, j, 0) << np.uint32(4 * (k - 1 - j)))
        anybad = anybad | lshift(bad, j, True)
    pos = jax.lax.broadcasted_iota(jnp.int32, (P, L), 1)
    invalid = anybad | (pos > L - k)
    h = jnp.minimum(_mix32(packed), np.uint32(0xFFFFFFFE))
    return jnp.where(invalid, INVALID_HASH, h)


def aa_sketch_batch(tokens: np.ndarray, k: int = 7, w: int = 6) -> tuple:
    """Host convenience: (hashes, flags) for one padded AA batch."""
    h = aa_kmer_hashes(jnp.asarray(tokens), k)
    f = minimizer_flags(h, w)
    return np.asarray(h), np.asarray(f)


@functools.partial(jax.jit, static_argnames=("k", "w"))
def _aa_sketch_flagged_dev(tokens: jax.Array, k: int, w: int) -> jax.Array:
    h = aa_kmer_hashes(tokens, k)
    f = minimizer_flags(h, w)
    return jnp.where(f, h, INVALID_HASH)


def aa_sketch_flagged(tokens: np.ndarray, k: int = 7, w: int = 6) -> tuple:
    """(rows, cols, hash) of AA minimizer positions — chunk-fetched."""
    from ..utils.fetch import fetch_np
    packed = fetch_np(_aa_sketch_flagged_dev(jnp.asarray(tokens), k, w))
    rows, cols = np.nonzero(packed != INVALID_HASH)
    return rows, cols, packed[rows, cols]
