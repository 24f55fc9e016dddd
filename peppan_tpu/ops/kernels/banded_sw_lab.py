"""Kernel lab: parameterized variants of the v2 score kernel.

Experiments toward the derived ~460 Gcell/s score-mode SOL
(BASELINE.md "DP kernel roofline"); each knob is measured by
benchmarks/kernel_lab.py on the real chip and the results recorded in
BASELINE.md win or lose.  Winners get promoted into banded_sw_v2.

Knobs:
  state_dtype  'int32' (v2 baseline) or 'int16'.  int16 halves the
      VMEM bytes per carried tile and doubles the VPU's elementwise
      int16 throughput where Mosaic supports it.  Exactness: H >= 0
      always (local alignment), so E = max(H_left - open, E_left - ext)
      >= -open after the first step at every cell — the "no gap yet"
      sentinel never decays below NEG16 - ext transiently, and stored
      state stays in [-open, match*min(Mq,Mt)].  Guarded by
      match * min(Mq, Mt) + match <= 32767.  NOTE this differs from the
      2026-08-18 dead end (banded_sw_v2.py docstring): that attempt
      BITCAST-packed two int16 cells into one int32 lane slot, producing
      vector<8x128x2xi16> ops the Mosaic legalizer rejects; here the
      tiles are plain (band, block_p) int16 arrays on the native
      (16, 128) tiling.
  token_dtype  'int32' (v2 baseline), 'int16' or 'int8' — dtype of the
      resident q/t slices (the two sequence reads per half-step are the
      only memory traffic in the inner loop).
  defer_hmax   update the running best once per double-step
      (max(H_even, H_odd)) instead of per half-step: one fewer VPU op
      per two half-steps, exact because the running max is associative.
  fold_shift   one sublane shift per half-step instead of two: the gap
      recurrences only consume SHIFTED operands jointly —
      En = max(shift(H1) - open, shift(E1) - ext) = shift(max(H1 - open,
      E1 - ext)) because the sublane shift commutes with elementwise
      max/sub; the inserted boundary row becomes max(0 - open, NEG - ext)
      = -open (exact).  Same for the F side on odd parity.  Cross-lane
      shifts are one of the three named SOL gaps (BASELINE.md roofline
      notes), so halving them is the structural experiment.  MEASURED
      +20-36% on v5e 2026-08-20; promoted to banded_sw_v2.
  derive_ts    incremental sequence tiles: instead of three unaligned
      B-row extractions per double-step (qs, ts_odd, ts_even), extract
      once at the chunk head and derive each subsequent tile by a
      single-row shift-and-append (qs slides +1 row/step, ts slides -1;
      ts_even(u) = ts_odd(u-1) exactly).  Targets the sequence-slice
      address-generation gap; trades extraction work for longer SSA
      chains on two extra live tiles.
  loop_unroll  fori_loop unroll factor over chunks: fewer loop-boundary
      carry spills per double-step without widening the per-chunk
      sequence slices (chunk=16 did that and lost to register pressure).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(10 ** 6)
NEG16 = -30000


@functools.partial(jax.jit, static_argnames=(
    "match", "mismatch", "gap_open", "gap_extend", "band", "c0", "block_p",
    "chunk", "state_dtype", "token_dtype", "defer_hmax", "fold_shift",
    "derive_ts", "loop_unroll", "interpret"))
def sw_banded_scores_lab(q: jax.Array, t: jax.Array, *,
                         match: int = 2, mismatch: int = -3,
                         gap_open: int = 5, gap_extend: int = 2,
                         band: int = 128, c0: int = 0,
                         block_p: int = 128, chunk: int = 8,
                         state_dtype: str = "int32",
                         token_dtype: str = "int32",
                         defer_hmax: bool = False,
                         fold_shift: bool = False,
                         derive_ts: bool = False,
                         loop_unroll: int = 1,
                         interpret: bool = False) -> jax.Array:
    """Score-only banded SW, variant-parameterized; bit-equal to
    ops.sw.sw_banded(score mode) for every knob combination (the int16
    guard raises rather than risk overflow)."""
    if c0 % 2 != 0:
        raise ValueError("c0 must be even")
    if chunk % 8 != 0:
        raise ValueError("chunk must be a multiple of 8")
    P, Mq = q.shape
    _, Mt = t.shape
    B = band
    if P % block_p:
        raise ValueError(f"P={P} not a multiple of block_p={block_p}")
    sdt = jnp.dtype(state_dtype)
    tdt = jnp.dtype(token_dtype)
    if sdt == jnp.int16 and match * min(Mq, Mt) + match > 32767:
        raise ValueError("int16 state: score range exceeds 15 bits "
                         f"(match={match}, min(Mq,Mt)={min(Mq, Mt)})")
    neg = NEG16 if sdt == jnp.int16 else NEG
    open_first = gap_open + gap_extend

    D = Mq + Mt - 1
    K = (D + 1) // 2
    Kpad = ((K + chunk - 1) // chunk) * chunk

    PADL = B // 2 + abs(c0) // 2 + 2
    i0p0 = (-c0) // 2 - B // 2 + PADL
    wq_need = (2 * (Kpad - 1) - c0) // 2 - B // 2 + PADL + B + 2 * chunk
    qT = jnp.pad(q.astype(tdt),
                 ((0, 0), (PADL, max(0, wq_need - Mq - PADL))),
                 constant_values=5).T          # (Wq, P)
    trev = jnp.flip(t.astype(tdt), axis=1)
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
    talign = tlow0 - (tlow0 % chunk)

    import numpy as np
    mvec = sdt.type(match)       # numpy scalars: become kernel immediates,
    xvec = sdt.type(mismatch)    # not captured device constants
    del np

    def kernel(q_ref, t_ref, out_ref):
        zero = jnp.zeros((B, block_p), sdt)

        def half(qs, ts, parity, H1, H2, E1, F1):
            sv = jnp.where(qs == ts, mvec, xvec)
            if fold_shift:
                # one shift per half: the gap recurrence only ever uses
                # its two shifted operands jointly, and the sublane shift
                # commutes with elementwise max/sub (docstring)
                ho = H1 - open_first
                if parity == 0:
                    T = jnp.maximum(ho, E1 - gap_extend)
                    En = jnp.concatenate(
                        [T[1:], zero[:1] - open_first], axis=0)
                    Fn = jnp.maximum(ho, F1 - gap_extend)
                else:
                    T = jnp.maximum(ho, F1 - gap_extend)
                    Fn = jnp.concatenate(
                        [zero[:1] - open_first, T[:-1]], axis=0)
                    En = jnp.maximum(ho, E1 - gap_extend)
            else:
                if parity == 0:
                    Hup, Fup = H1, F1
                    Hleft = jnp.concatenate([H1[1:], zero[:1]], axis=0)
                    Eleft = jnp.concatenate([E1[1:], zero[:1] + neg],
                                            axis=0)
                else:
                    Hup = jnp.concatenate([zero[:1], H1[:-1]], axis=0)
                    Fup = jnp.concatenate([zero[:1] + neg, F1[:-1]],
                                          axis=0)
                    Hleft, Eleft = H1, E1
                En = jnp.maximum(Hleft - open_first, Eleft - gap_extend)
                Fn = jnp.maximum(Hup - open_first, Fup - gap_extend)
            dv = H2 + sv
            Hn = jnp.maximum(jnp.maximum(dv, 0), jnp.maximum(En, Fn))
            return Hn, H1, En, Fn

        def chunk_body(c, carry):
            H1, H2, E1, F1, Hmax = carry
            qbase = pl.multiple_of(qalign + c * chunk, chunk)
            tbase = pl.multiple_of(talign - c * chunk, chunk)
            qblk = q_ref[pl.ds(qbase, B + 2 * chunk), :]
            tblk = t_ref[pl.ds(tbase, B + 2 * chunk + 1), :]
            toff0 = (x0base - talign)
            qs = ts_odd = None
            for u in range(chunk):
                toff = toff0 - u
                if not derive_ts:
                    qs = qblk[rq + u:rq + u + B, :]
                    ts_odd = tblk[toff:toff + B, :]
                    ts_even = tblk[toff + 1:toff + 1 + B, :]
                elif u == 0:
                    qs = qblk[rq:rq + B, :]
                    ts_odd = tblk[toff0:toff0 + B, :]
                    ts_even = tblk[toff0 + 1:toff0 + 1 + B, :]
                else:
                    # qs slides +1 query row per double-step; ts slides
                    # -1; and this step's even tile IS last step's odd
                    ts_even = ts_odd
                    qs = jnp.concatenate(
                        [qs[1:], qblk[rq + u + B - 1:rq + u + B, :]],
                        axis=0)
                    ts_odd = jnp.concatenate(
                        [tblk[toff:toff + 1, :], ts_odd[:-1]], axis=0)
                He, H1, E1, F1 = half(qs, ts_even, 0, H1, H2, E1, F1)
                H2 = H1
                H1 = He
                Ho, H1, E1, F1 = half(qs, ts_odd, 1, H1, H2, E1, F1)
                H2 = H1
                H1 = Ho
                if defer_hmax:
                    Hmax = jnp.maximum(Hmax, jnp.maximum(He, Ho))
                else:
                    Hmax = jnp.maximum(jnp.maximum(Hmax, He), Ho)
            return (H1, H2, E1, F1, Hmax)

        init = (zero, zero, zero + neg, zero + neg, zero)
        carry = jax.lax.fori_loop(0, Kpad // chunk, chunk_body, init,
                                  unroll=loop_unroll)
        out_ref[:] = carry[4].astype(jnp.int32)

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
    "match", "mismatch", "gap_open", "gap_extend", "band", "c0", "interpret"))
def sw_banded_scores_lanes(q: jax.Array, t: jax.Array, *,
                           match: int = 2, mismatch: int = -3,
                           gap_open: int = 5, gap_extend: int = 2,
                           band: int = 128, c0: int = 0,
                           interpret: bool = False) -> jax.Array:
    """Band-on-LANES layout experiment (score mode, fold-shift form).

    The v2 kernel puts the band on sublanes: every band shift crosses
    vreg boundaries (16 vregs per (128,128) tile) and the three sequence
    reads per double-step are unaligned SUBLANE slices.  Here the band
    occupies the 128 LANES of a single (8, 128) vreg per 8 pairs:

      - state tiles (H1, H2, E1, F1, Hmax) are ONE vreg each, so the
        whole recurrence is register-resident per grid instance;
      - the band shift is an in-vreg lane roll (pltpu.roll, axis=1) plus
        a boundary overwrite — no cross-vreg carry chain;
      - sequence windows slide one LANE per double-step.  Mosaic rejects
        unaligned lane slices (the v1 dead-end note), so windows come
        from ALIGNED (8, 384/512) loads once per 128 double-steps, a
        carried +-8-lane roll per 8-step inner iteration, and a static
        0..7-lane roll + aligned [:, :128] slice per step.

    Grid: one instance per 8 pairs (P/8).  Bit-equal to
    ops.sw.sw_banded(score mode) by the same geometry as v2.
    """
    if c0 % 2 != 0:
        raise ValueError("c0 must be even")
    if band != 128:
        raise ValueError("lanes layout requires band == 128 (one vreg)")
    P, Mq = q.shape
    _, Mt = t.shape
    B = band
    BP = 8                     # pairs per grid instance (sublane quantum)
    if P % BP:
        raise ValueError(f"P={P} not a multiple of {BP}")
    open_first = gap_open + gap_extend

    D = Mq + Mt - 1
    K = (D + 1) // 2
    Kpad = ((K + 127) // 128) * 128
    NC = Kpad // 128           # outer chunks of 128 double-steps

    PADL = B // 2 + abs(c0) // 2 + 2
    i0p0 = (-c0) // 2 - B // 2 + PADL
    rq = i0p0 % 128
    qalign = i0p0 - rq
    wq_need = qalign + 128 * (NC - 1) + 384
    qL = jnp.pad(q.astype(jnp.int32),
                 ((0, 0), (PADL, max(0, wq_need - Mq - PADL))),
                 constant_values=5)                    # (P, WqL)

    trev = jnp.flip(t.astype(jnp.int32), axis=1)
    x0_of = lambda d: Mt - 1 - d + ((d - c0) // 2 - B // 2)  # noqa: E731
    PADT = max(0, -x0_of(2 * Kpad - 1)) + 16
    x0base0 = Mt - 2 + PADT - c0 // 2 - B // 2
    talign0 = x0base0 - (x0base0 % 128)
    # left margin so the deepest chunk's aligned 512-lane load stays >= 0
    extra = max(0, 128 * (NC - 1) + 256 - talign0)
    extra = ((extra + 127) // 128) * 128
    PADT += extra
    x0base = x0base0 + extra
    rt = x0base % 128
    talign = x0base - rt
    wt_need = talign + 256
    tL = jnp.pad(trev, ((0, 0), (PADT, max(0, wt_need - Mt - PADT))),
                 constant_values=6)                    # (P, WtL)
    WqL = qL.shape[1]
    WtL = tL.shape[1]

    def kernel(q_ref, t_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (BP, B), 1)
        first_lane = lane == 0
        last_lane = lane == B - 1
        zero = jnp.zeros((BP, B), jnp.int32)

        def roll_l(x, o):
            return pltpu.roll(x, shift=(-o) % x.shape[1], axis=1)

        def half(qs, ts, parity, H1, H2, E1, F1, Hmax):
            sv = jnp.where(qs == ts, match, mismatch)
            ho = H1 - open_first
            if parity == 0:
                T = jnp.maximum(ho, E1 - gap_extend)
                En = jnp.where(last_lane, -open_first, roll_l(T, 1))
                Fn = jnp.maximum(ho, F1 - gap_extend)
            else:
                T = jnp.maximum(ho, F1 - gap_extend)
                Fn = jnp.where(first_lane, -open_first, roll_l(T, -1))
                En = jnp.maximum(ho, E1 - gap_extend)
            dv = H2 + sv
            Hn = jnp.maximum(jnp.maximum(dv, 0), jnp.maximum(En, Fn))
            return Hn, H1, En, Fn, jnp.maximum(Hmax, Hn)

        def chunk_body(c, carry):
            H1, H2, E1, F1, Hmax = carry
            qb = pl.multiple_of(qalign + 128 * c, 128)
            tb = pl.multiple_of(talign - 128 * c - 256, 128)
            ABq0 = q_ref[:, pl.ds(qb, 384)]
            ABt0 = t_ref[:, pl.ds(tb, 512)]

            def sub_body(s, sc):
                ABq, ABt, H1, H2, E1, F1, Hmax = sc
                for u in range(8):
                    qs = roll_l(ABq, rq + u)[:, :128]
                    ts_odd = roll_l(ABt, rt + 256 - u)[:, :128]
                    ts_even = roll_l(ABt, rt + 257 - u)[:, :128]
                    H1, H2, E1, F1, Hmax = half(qs, ts_even, 0,
                                                H1, H2, E1, F1, Hmax)
                    H1, H2, E1, F1, Hmax = half(qs, ts_odd, 1,
                                                H1, H2, E1, F1, Hmax)
                return (roll_l(ABq, 8), roll_l(ABt, -8),
                        H1, H2, E1, F1, Hmax)

            sc = jax.lax.fori_loop(
                0, 16, sub_body, (ABq0, ABt0, H1, H2, E1, F1, Hmax))
            return sc[2:]

        init = (zero, zero, zero + NEG, zero + NEG, zero)
        carry = jax.lax.fori_loop(0, NC, chunk_body, init)
        out_ref[:] = carry[4]

    grid = (P // BP,)
    hmax = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BP, WqL), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, WtL), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BP, B), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, B), jnp.int32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=P * D * B * 10, bytes_accessed=P * (WqL + WtL) * 4,
            transcendentals=0),
    )(qL, tL)
    return jnp.max(hmax, axis=1)
