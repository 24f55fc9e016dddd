"""Pallas banded-SW v2: register-resident SSA carries (score mode).

Round-1's kernel (banded_sw.py) kept the wavefront state in VMEM scratch
refs; Mosaic lowered every half-step's scratch read/write as its own VMEM
pass, landing at ~4 Gcells/s vs ~90 for the XLA scan.  This rewrite keeps
the state as LOOP-CARRIED SSA VALUES through `jax.lax.fori_loop` and fully
unrolls the CHUNK half-steps inside the loop body, so within a chunk the
(band, block_p) state tiles live in vector registers and spill to VMEM at
most once per chunk boundary — the "per-chunk SSA carries" plan from the
v1 docstring.

Same band geometry / shift schedule / tie-breaks as ops.sw.sw_banded
(see its module docstring); bit-equal scores by construction and by test
(tests/unit/test_pallas_kernel.py drives both backends).

Dead end, measured so it stays dead (2026-08-18): an int16-state variant
(two DP cells per 32-bit lane slot; exact because score-mode H >= 0 bounds
E/F below by -(open+ext)) does NOT lower on the current Mosaic toolchain —
`arith.cmpi eq` and `arith.maxsi` on packed vector<8x128x2xi16> are both
rejected by the Mosaic vector legalizer.  Revisit if Mosaic grows packed
16-bit compare/max support; until then int32 state is the floor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(10 ** 6)
CHUNK = 8  # double-steps per aligned load (sublane alignment quantum)
# full-unroll cap: 128 steps covers the production pair buckets up to
# ~1k-wide sequences (the bench shape) without minutes-scale Mosaic
# compiles on the rare wide buckets (which keep the rolled loop)
_FULL_UNROLL_MAX_STEPS = 128


@functools.partial(jax.jit, static_argnames=(
    "match", "mismatch", "gap_open", "gap_extend", "band", "c0", "block_p",
    "chunk", "interpret"))
def sw_banded_scores_pallas_v2(q: jax.Array, t: jax.Array, *,
                               match: int = 2, mismatch: int = -3,
                               gap_open: int = 5, gap_extend: int = 2,
                               band: int = 128, c0: int = 0,
                               block_p: int = 128, chunk: int = CHUNK,
                               interpret: bool = False) -> jax.Array:
    """Score-only banded SW; bit-equal to ops.sw.sw_banded(score mode).

    q: int8[P, Mq] (query PAD=5 convention), t: int8[P, Mt]
    (prep_target_tokens convention).  P must be a multiple of block_p.
    Returns int32[P] best local score per pair.
    """
    if c0 % 2 != 0:
        raise ValueError("c0 must be even")
    if chunk % 8 != 0:
        raise ValueError("chunk must be a multiple of 8 (sublane quantum)")
    P, Mq = q.shape
    _, Mt = t.shape
    B = band
    if P % block_p:
        raise ValueError(f"P={P} not a multiple of block_p={block_p}")
    open_first = gap_open + gap_extend

    D = Mq + Mt - 1
    K = (D + 1) // 2
    Kpad = ((K + chunk - 1) // chunk) * chunk

    # padding scheme of ops.sw.sw_banded, extended to cover Kpad steps and
    # the chunk-aligned loads (identical to banded_sw.py v1)
    PADL = B // 2 + abs(c0) // 2 + 2
    i0p0 = (-c0) // 2 - B // 2 + PADL
    wq_need = (2 * (Kpad - 1) - c0) // 2 - B // 2 + PADL + B + 2 * chunk
    qT = jnp.pad(q.astype(jnp.int32),
                 ((0, 0), (PADL, max(0, wq_need - Mq - PADL))),
                 constant_values=5).T          # (Wq, P)
    trev = jnp.flip(t.astype(jnp.int32), axis=1)
    x0_of = lambda d: Mt - 1 - d + ((d - c0) // 2 - B // 2)  # noqa: E731
    PADT = max(0, -x0_of(2 * Kpad - 1)) + 2 * chunk
    wt_need = x0_of(0) + PADT + B + 2 + 2 * chunk
    tT = jnp.pad(trev, ((0, 0), (PADT, max(0, wt_need - Mt - PADT))),
                 constant_values=6).T          # (Wt, P)
    Wq = qT.shape[0]
    Wt = tT.shape[0]
    x0base = Mt - 2 + PADT - c0 // 2 - B // 2
    rq = i0p0 % chunk
    qalign = i0p0 - rq
    tlow0 = x0base - (chunk - 1)
    rt = tlow0 % chunk
    talign = tlow0 - rt

    def kernel(q_ref, t_ref, out_ref):
        zero = jnp.zeros((B, block_p), jnp.int32)

        def half(qs, ts, parity, H1, H2, E1, F1, Hmax):
            # fold-shift form (measured +36% on v5e, 2026-08-20): the gap
            # recurrence only consumes its two SHIFTED operands jointly,
            # and the sublane shift commutes with elementwise max/sub —
            # En = max(shift(H1)-open, shift(E1)-ext) = shift(max(H1-open,
            # E1-ext)) — so each half pays ONE cross-sublane shift instead
            # of two.  Inserted boundary row = max(0-open, NEG-ext) =
            # -open (bit-equal; tests drive both backends)
            sv = jnp.where(qs == ts, match, mismatch)
            ho = H1 - open_first
            if parity == 0:
                T = jnp.maximum(ho, E1 - gap_extend)
                En = jnp.concatenate([T[1:], zero[:1] - open_first], axis=0)
                Fn = jnp.maximum(ho, F1 - gap_extend)
            else:
                T = jnp.maximum(ho, F1 - gap_extend)
                Fn = jnp.concatenate([zero[:1] - open_first, T[:-1]], axis=0)
                En = jnp.maximum(ho, E1 - gap_extend)
            dv = H2 + sv
            Hn = jnp.maximum(jnp.maximum(dv, 0), jnp.maximum(En, Fn))
            return Hn, H1, En, Fn, jnp.maximum(Hmax, Hn)

        def chunk_body(c, carry):
            H1, H2, E1, F1, Hmax = carry
            qbase = pl.multiple_of(qalign + c * chunk, chunk)
            tbase = pl.multiple_of(talign - c * chunk, chunk)
            qblk = q_ref[pl.ds(qbase, B + 2 * chunk), :]
            tblk = t_ref[pl.ds(tbase, B + 2 * chunk + 1), :]
            for u in range(chunk):
                qs = qblk[rq + u:rq + u + B, :]
                toff = (x0base - talign) - u
                ts_odd = tblk[toff:toff + B, :]
                ts_even = tblk[toff + 1:toff + 1 + B, :]
                H1, H2, E1, F1, Hmax = half(qs, ts_even, 0,
                                            H1, H2, E1, F1, Hmax)
                H1, H2, E1, F1, Hmax = half(qs, ts_odd, 1,
                                            H1, H2, E1, F1, Hmax)
            return (H1, H2, E1, F1, Hmax)

        init = (zero, zero, zero + NEG, zero + NEG, zero)
        # full unroll (round 4, measured): Mosaic's fori_loop supports
        # only unroll 1 or num_steps; at num_steps the loop-carried tile
        # spills at chunk boundaries disappear and the chunk loads get
        # static offsets — median 189 vs 156 Gcell/s for the looped form
        # across 5 paired tunnel sessions (BASELINE.md kernel-lab table).
        # Capped to bound Mosaic compile time on wide buckets.
        # (interpret mode keeps the rolled loop: XLA-CPU compile of the
        # unrolled body is minutes-scale and adds no test coverage — the
        # lab kernel's loop_unroll knob pins unrolled bit-equality at a
        # small shape instead)
        n_steps = Kpad // chunk
        unroll = n_steps if (n_steps <= _FULL_UNROLL_MAX_STEPS
                             and not interpret) else 1
        carry = jax.lax.fori_loop(0, n_steps, chunk_body, init,
                                  unroll=unroll)
        out_ref[:] = carry[4]

    grid = (P // block_p,)
    hmax_all = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Wq, block_p), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wt, block_p), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, block_p), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=P * D * B * 10, bytes_accessed=P * (Wq + Wt) * 4,
            transcendentals=0),
    )(qT, tT)
    return jnp.max(hmax_all, axis=0)


@functools.partial(jax.jit, static_argnames=(
    "match", "mismatch", "gap_open", "gap_extend", "band", "c0", "block_p",
    "chunk", "interpret"))
def sw_banded_stats_pallas_v2(q: jax.Array, t: jax.Array, *,
                              match: int = 2, mismatch: int = -3,
                              gap_open: int = 5, gap_extend: int = 2,
                              band: int = 128, c0: int = 0,
                              block_p: int = 128, chunk: int = CHUNK,
                              interpret: bool = False) -> jax.Array:
    """Stats-mode register-carry kernel: packed int32[7, P] result in
    ops.sw.STATS_KEYS order, bit-equal to ops.sw.sw_banded_packed with the
    DNA equality scorer (qpad=5/tpad=6 conventions, n_real_tokens=4).

    Same band geometry, shift schedule, packed-halves stats encoding
    (SMA = matches<<16|aln_len, SQT = (q+BIAS)<<16|(t+BIAS)) and
    tie-breaks as the XLA-scan engine; the chunk-unrolled fori_loop keeps
    all 17 carried (band, block_p) tiles register/VMEM-resident per chunk
    instead of round-tripping scratch every half-step.

    This revision carries 15 tiles (was 17): the best-score tracker
    packs (score, anti-diagonal) into ONE int32 per lane-cell
    (score<<16 | (65535-d); monotone-increasing d makes the packed max
    reproduce the strict score-improvement rule AND the earliest-d
    cross-lane tie-break), and the best end-coordinate tile is gone —
    qend/tend are recomputed after the kernel from the winning
    (d, lane), which determine the cell uniquely.  Requires
    match * min(Mq, Mt) <= 32767 (score must fit 15 bits).

    MEASURED (v5e, cache-proof slope, P=4096 M=1024 B=128): 17 carries
    = 34-36 Gcell/s; the 15-carry packed-tracker revision = ~37; adding
    the fold-shift halving (6 -> 3 sublane shifts per half, 2026-08-20)
    = ~44.5 — still below the XLA scan's ~80-98, because the 12
    stats-propagation tiles set the register pressure, and neither carry
    trimming nor shift folding changes that.  Kept as a verified
    alternate; production stats stay on the scan
    (ops.sw._pallas_stats_enabled, default off).  Score mode's 5 carries
    are production (PEPPAN_PALLAS_SCORES) — see its fold-shift note.
    """
    if c0 % 2 != 0:
        raise ValueError("c0 must be even")
    if chunk % 8 != 0:
        raise ValueError("chunk must be a multiple of 8 (sublane quantum)")
    P, Mq = q.shape
    _, Mt = t.shape
    B = band
    if P % block_p:
        raise ValueError(f"P={P} not a multiple of block_p={block_p}")
    open_first = gap_open + gap_extend
    BIAS = B + abs(c0) + 2
    if (Mq + BIAS > 32767 or min(Mq, Mt) + 1 > 32767
            or Mt + BIAS >= 65536 or Mq + Mt >= 65536
            or match * min(Mq, Mt) > 32767):
        raise ValueError("stats packing: widths exceed the 16-bit halves "
                         f"(Mq={Mq}, Mt={Mt}, BIAS={BIAS}, match={match})")

    D = Mq + Mt - 1
    K = (D + 1) // 2
    Kpad = ((K + chunk - 1) // chunk) * chunk

    PADL = B // 2 + abs(c0) // 2 + 2
    i0p0 = (-c0) // 2 - B // 2 + PADL
    wq_need = (2 * (Kpad - 1) - c0) // 2 - B // 2 + PADL + B + 2 * chunk
    qT = jnp.pad(q.astype(jnp.int32),
                 ((0, 0), (PADL, max(0, wq_need - Mq - PADL))),
                 constant_values=5).T          # (Wq, P)
    trev = jnp.flip(t.astype(jnp.int32), axis=1)
    x0_of = lambda d: Mt - 1 - d + ((d - c0) // 2 - B // 2)  # noqa: E731
    PADT = max(0, -x0_of(2 * Kpad - 1)) + 2 * chunk
    wt_need = x0_of(0) + PADT + B + 2 + 2 * chunk
    tT = jnp.pad(trev, ((0, 0), (PADT, max(0, wt_need - Mt - PADT))),
                 constant_values=6).T          # (Wt, P)
    Wq = qT.shape[0]
    Wt = tT.shape[0]
    x0base = Mt - 2 + PADT - c0 // 2 - B // 2
    rq = i0p0 % chunk
    qalign = i0p0 - rq
    tlow0 = x0base - (chunk - 1)
    rt = tlow0 % chunk
    talign = tlow0 - rt
    del rt

    def kernel(q_ref, t_ref, bsd_ref, bsma_ref, bsqt_ref):
        zero = jnp.zeros((B, block_p), jnp.int32)
        lanevec = jax.lax.broadcasted_iota(jnp.int32, (B, block_p), 0)

        def half(d, i0r, qs, ts, parity, st):
            (H1, H2, E1, F1,
             SH1a, SH1b, SH2a, SH2b, SE1a, SE1b, SF1a, SF1b,
             bSD, bSMA, bSQT) = st
            sv = jnp.where(qs == ts, match, mismatch)
            # fold-shift form (see score kernel): the shifted-operand side
            # of the gap recurrence — value max, its >= pick, and both
            # stats selections — all commute with the sublane shift, so
            # each half pays THREE shifts (En, SEna, SEnb or the F side)
            # instead of six.  Inserted boundary rows: value -open_first
            # (= max(0 - open, NEG - ext)), aln-stat 1 (= where(eo, 0, 0)
            # + 1), start-stat 0 — exactly v2's boundary algebra
            ho = H1 - open_first
            if parity == 0:
                T = jnp.maximum(ho, E1 - gap_extend)
                eo_u = ho >= E1 - gap_extend
                SEa_u = jnp.where(eo_u, SH1a, SE1a) + 1
                SEb_u = jnp.where(eo_u, SH1b, SE1b)
                En = jnp.concatenate([T[1:], zero[:1] - open_first], axis=0)
                SEna = jnp.concatenate([SEa_u[1:], zero[:1] + 1], axis=0)
                SEnb = jnp.concatenate([SEb_u[1:], zero[:1]], axis=0)
                Fn = jnp.maximum(ho, F1 - gap_extend)
                fo = ho >= F1 - gap_extend
                SFna = jnp.where(fo, SH1a, SF1a) + 1
                SFnb = jnp.where(fo, SH1b, SF1b)
            else:
                T = jnp.maximum(ho, F1 - gap_extend)
                fo_u = ho >= F1 - gap_extend
                SFa_u = jnp.where(fo_u, SH1a, SF1a) + 1
                SFb_u = jnp.where(fo_u, SH1b, SF1b)
                Fn = jnp.concatenate([zero[:1] - open_first, T[:-1]], axis=0)
                SFna = jnp.concatenate([zero[:1] + 1, SFa_u[:-1]], axis=0)
                SFnb = jnp.concatenate([zero[:1], SFb_u[:-1]], axis=0)
                En = jnp.maximum(ho, E1 - gap_extend)
                eo = ho >= E1 - gap_extend
                SEna = jnp.where(eo, SH1a, SE1a) + 1
                SEnb = jnp.where(eo, SH1b, SE1b)
            dv = H2 + sv
            Hn = jnp.maximum(jnp.maximum(dv, 0), jnp.maximum(En, Fn))

            ivec = i0r + lanevec
            jvec = d - ivec
            is_match = (qs == ts).astype(jnp.int32)

            fresh = H2 == 0
            cur_qt = (ivec + BIAS) * 65536 + (jvec + BIAS)
            dadd = is_match * 65536 + 1
            SMAdv = jnp.where(fresh, 0, SH2a) + dadd
            SQTdv = jnp.where(fresh, cur_qt, SH2b)

            pos = Hn > 0
            use_diag = (dv == Hn) & pos
            use_e = (~use_diag) & (En == Hn) & pos

            def pick(dvv, evv, fvv):
                x = jnp.where(use_e, evv, fvv)
                x = jnp.where(use_diag, dvv, x)
                return jnp.where(pos, x, 0)

            SHna = pick(SMAdv, SEna, SFna)
            SHnb = pick(SQTdv, SEnb, SFnb)

            # packed best tracker: score<<16 | (65535 - d).  d increases
            # monotonically, so packed_new > bSD  <=>  Hn > best score
            # (ties keep the earlier d), reproducing the scan's strict
            # update rule with ONE carry instead of three
            packed_new = Hn * 65536 + (65535 - d)
            upd = packed_new > bSD
            bSD = jnp.where(upd, packed_new, bSD)
            bSMA = jnp.where(upd, SHna, bSMA)
            bSQT = jnp.where(upd, SHnb, bSQT)
            return (Hn, H1, En, Fn,
                    SHna, SHnb, SH1a, SH1b, SEna, SEnb, SFna, SFnb,
                    bSD, bSMA, bSQT)

        def chunk_body(c, st):
            qbase = pl.multiple_of(qalign + c * chunk, chunk)
            tbase = pl.multiple_of(talign - c * chunk, chunk)
            qblk = q_ref[pl.ds(qbase, B + 2 * chunk), :]
            tblk = t_ref[pl.ds(tbase, B + 2 * chunk + 1), :]
            for u in range(chunk):
                kk = c * chunk + u           # double-step index
                i0r = kk + i0p0 - PADL
                qs = qblk[rq + u:rq + u + B, :]
                toff = (x0base - talign) - u
                ts_odd = tblk[toff:toff + B, :]
                ts_even = tblk[toff + 1:toff + 1 + B, :]
                st = half(2 * kk, i0r, qs, ts_even, 0, st)
                st = half(2 * kk + 1, i0r, qs, ts_odd, 1, st)
            return st

        zero = jnp.zeros((B, block_p), jnp.int32)
        init = (zero, zero, zero + NEG, zero + NEG,
                zero, zero, zero, zero, zero, zero, zero, zero,
                zero, zero, zero)
        # full unroll mirrors the score kernel's round-4 promotion: the
        # 15 carried tiles spill at every rolled-loop boundary, which is
        # exactly what the unroll removes (measured on-chip; see
        # BASELINE.md kernel-lab table)
        n_steps = Kpad // chunk
        unroll = n_steps if (n_steps <= _FULL_UNROLL_MAX_STEPS
                             and not interpret) else 1
        st = jax.lax.fori_loop(0, n_steps, chunk_body, init,
                               unroll=unroll)
        bsd_ref[:] = st[12]
        bsma_ref[:] = st[13]
        bsqt_ref[:] = st[14]

    grid = (P // block_p,)
    ospec = pl.BlockSpec((B, block_p), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((B, P), jnp.int32)
    bSD, bSMA, bSQT = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Wq, block_p), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wt, block_p), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(ospec,) * 3,
        out_shape=(oshape,) * 3,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=P * D * B * 24, bytes_accessed=P * (Wq + Wt) * 4,
            transcendentals=0),
    )(qT, tT)

    # cross-lane pick: the packed max IS the scan's order (score desc,
    # then earliest anti-diagonal via the inverted-d low half, then
    # smallest band index via argmax's first-occurrence rule)
    best = jnp.max(bSD, axis=0)
    lane = jnp.argmax(bSD, axis=0).astype(jnp.int32)

    def at_lane(S):
        return jnp.take_along_axis(S, lane[None, :], axis=0)[0]

    score = best >> 16
    d_star = 65535 - (best & 0xFFFF)
    # the winning cell's coordinates follow from (d, lane):
    # i = d//2 + i0p0 - PADL + lane,  j = d - i  (see half()'s ivec/jvec)
    qend = d_star // 2 + (i0p0 - PADL) + lane
    tend = d_star - qend
    empty = score <= 0
    sma = at_lane(bSMA)
    sqt = at_lane(bSQT)
    return jnp.stack([
        score,
        jnp.where(empty, -1, qend),                           # qend
        jnp.where(empty, -1, tend),                           # tend
        jnp.where(empty, 0, sma >> 16),                       # matches
        jnp.where(empty, 0, sma & 0xFFFF),                    # aln_len
        jnp.where(empty, 0, (sqt >> 16) - BIAS),              # qstart
        jnp.where(empty, 0, (sqt & 0xFFFF) - BIAS),           # tstart
    ])
