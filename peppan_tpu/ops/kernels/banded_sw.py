"""Pallas TPU kernel for banded Smith-Waterman (score mode).

Same recurrence, band geometry and double-step shift schedule as
ops.sw.sw_banded (see its module docstring), expressed as a Mosaic kernel
with a TRANSPOSED layout: the wavefront state is (band, block_p) — band
positions on sublanes, pairs on lanes.  That choice is what makes the
kernel expressible at all on TPU:

  - the per-anti-diagonal sequence reads slide by one position per
    double-step; in lane-dimension layout that is an unaligned 128-lane
    vector load which Mosaic rejects ("index ... multiple of 128").  On
    sublanes the alignment quantum is 8, so the loop runs in chunks of 8
    double-steps: each chunk issues one aligned (band+16, block_p) load
    per operand and the 8 inner double-steps use STATIC in-chunk offsets;
  - the band-shift of the wavefront becomes a sublane shift
    (concatenate), which has no alignment constraint.

The kernel keeps all state in VMEM scratch for the whole anti-diagonal
loop and emits the per-lane running max (band, block_p) per block; the
cross-band reduction happens outside.  Bit-equal to the XLA-scan engine.

STATUS (v5e, 2026-08): this kernel measures ~4 Gcells/s vs ~90 Gcells/s
for the XLA scan in ops.sw (cache-proof slope measurements; see bench.py
for why naive timing lies on this backend) — Mosaic lowers each scratch
read/write as its own VMEM pass, while XLA fuses the whole double-step
into one register-resident sweep per (8,128) tile.  The recurrence has no DMA or
layout structure Pallas can exploit beyond what XLA already emits, so the
scan remains the production engine and this kernel is kept as a verified
alternate backend / starting point for a register-tiled rewrite
(per-chunk SSA carries instead of scratch stores).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(10 ** 6)
CHUNK = 8  # double-steps per aligned load (sublane alignment quantum)


@functools.partial(jax.jit, static_argnames=(
    "match", "mismatch", "gap_open", "gap_extend", "band", "c0", "block_p",
    "interpret"))
def sw_banded_scores_pallas(q: jax.Array, t: jax.Array, *, match: int = 2,
                            mismatch: int = -3, gap_open: int = 5,
                            gap_extend: int = 2, band: int = 128,
                            c0: int = 0, block_p: int = 128,
                            interpret: bool = False) -> jax.Array:
    """Score-only banded SW; bit-equal to ops.sw.sw_banded(score mode).

    q: int8[P, Mq] (query PAD=5 convention), t: int8[P, Mt]
    (prep_target_tokens convention).  P must be a multiple of block_p.
    Returns int32[P] best local score per pair.
    """
    if c0 % 2 != 0:
        raise ValueError("c0 must be even")
    P, Mq = q.shape
    _, Mt = t.shape
    B = band
    if P % block_p:
        raise ValueError(f"P={P} not a multiple of block_p={block_p}")
    open_first = gap_open + gap_extend

    D = Mq + Mt - 1
    K = (D + 1) // 2
    Kpad = ((K + CHUNK - 1) // CHUNK) * CHUNK

    # padding scheme of ops.sw.sw_banded, extended to cover Kpad steps and
    # the chunk-aligned loads
    PADL = B // 2 + abs(c0) // 2 + 2
    i0p0 = (-c0) // 2 - B // 2 + PADL
    wq_need = (2 * (Kpad - 1) - c0) // 2 - B // 2 + PADL + B + 2 * CHUNK
    qT = jnp.pad(q.astype(jnp.int32),
                 ((0, 0), (PADL, max(0, wq_need - Mq - PADL))),
                 constant_values=5).T          # (Wq, P)
    trev = jnp.flip(t.astype(jnp.int32), axis=1)
    x0_of = lambda d: Mt - 1 - d + ((d - c0) // 2 - B // 2)  # noqa: E731
    PADT = max(0, -x0_of(2 * Kpad - 1)) + 2 * CHUNK
    wt_need = x0_of(0) + PADT + B + 2 + 2 * CHUNK
    tT = jnp.pad(trev, ((0, 0), (PADT, max(0, wt_need - Mt - PADT))),
                 constant_values=6).T          # (Wt, P)
    Wq = qT.shape[0]
    Wt = tT.shape[0]
    # per double-step k: q rows [i0p0+k, i0p0+k+B); t rows [x0(k), x0(k)+B+1)
    # with x0(k) = x0base - k (descending)
    x0base = Mt - 2 + PADT - c0 // 2 - B // 2
    rq = i0p0 % CHUNK                      # static in-chunk offset (asc)
    qalign = i0p0 - rq                     # chunk-aligned base (+ 8c)
    tlow0 = x0base - (CHUNK - 1)           # lowest t row in chunk 0
    rt = tlow0 % CHUNK
    talign = tlow0 - rt

    def kernel(q_ref, t_ref, out_ref, h1, h2, e1, f1, hmax):
        zero = jnp.zeros((B, block_p), jnp.int32)
        h1[:] = zero
        h2[:] = zero
        e1[:] = zero + NEG
        f1[:] = zero + NEG
        hmax[:] = zero

        def half(qs, ts, parity):
            H1, H2, E1, F1 = h1[:], h2[:], e1[:], f1[:]
            sv = jnp.where(qs == ts, match, mismatch)
            if parity == 0:
                Hup, Fup = H1, F1
                # "left" source lives one band slot higher
                Hleft = jnp.concatenate([H1[1:], zero[:1]], axis=0)
                Eleft = jnp.concatenate([E1[1:], zero[:1] + NEG], axis=0)
            else:
                Hup = jnp.concatenate([zero[:1], H1[:-1]], axis=0)
                Fup = jnp.concatenate([zero[:1] + NEG, F1[:-1]], axis=0)
                Hleft, Eleft = H1, E1
            En = jnp.maximum(Hleft - open_first, Eleft - gap_extend)
            Fn = jnp.maximum(Hup - open_first, Fup - gap_extend)
            dv = H2 + sv
            Hn = jnp.maximum(jnp.maximum(dv, 0), jnp.maximum(En, Fn))
            h2[:] = H1
            h1[:] = Hn
            e1[:] = En
            f1[:] = Fn
            hmax[:] = jnp.maximum(hmax[:], Hn)

        def chunk_body(c, _):
            qbase = pl.multiple_of(qalign + c * CHUNK, CHUNK)
            tbase = pl.multiple_of(talign - c * CHUNK, CHUNK)
            qblk = q_ref[pl.ds(qbase, B + 2 * CHUNK), :]
            tblk = t_ref[pl.ds(tbase, B + 2 * CHUNK + 1), :]
            for u in range(CHUNK):
                qs = qblk[rq + u:rq + u + B, :]
                # x0(k) - tbase = x0base - (8c + u) - (talign - 8c)
                #              = (x0base - talign) - u   (static)
                toff = (x0base - talign) - u
                ts_odd = tblk[toff:toff + B, :]
                ts_even = tblk[toff + 1:toff + 1 + B, :]
                half(qs, ts_even, 0)
                half(qs, ts_odd, 1)
            return 0

        jax.lax.fori_loop(0, Kpad // CHUNK, chunk_body, 0)
        out_ref[:] = hmax[:]

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
        scratch_shapes=[pltpu.VMEM((B, block_p), jnp.int32)
                        for _ in range(5)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=P * D * B * 10, bytes_accessed=P * (Wq + Wt) * 4,
            transcendentals=0),
    )(qT, tT)
    return jnp.max(hmax_all, axis=0)
