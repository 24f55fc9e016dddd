"""Banded affine-gap Smith-Waterman as a JAX anti-diagonal wavefront.

This is the framework's core alignment engine — the TPU-native replacement
for PEPPAN's blastn/diamond/mmseqs subprocess searches (SURVEY.md §2.2,
§3.2).  The DP matrix is processed as a wavefront over anti-diagonals
d = i + j; a band of B "lanes" tracks B consecutive query rows per
anti-diagonal, so the whole batch advances as (pairs, band) int32 vector ops
on the VPU — no data-dependent shapes, no gathers in the inner loop (the two
sequence reads per step are contiguous dynamic slices).

Geometry and tie-breaking exactly match peppan_tpu/ops/sw_oracle.py (the
numpy oracle); tests assert bit-equality of scores, coordinates, matches and
alignment lengths between the two.

Two modes:
  - score-only: carries (H1, H2, E, F) + running best/argmax — the fast path
    used for all-vs-all prefiltering and clustering verification;
  - with stats: additionally carries (matches, aln_len, qstart, tstart)
    through H/E/F so exact identity and coverage come out of a single pass
    with no traceback memory (SURVEY.md §7.3.3: full traceback for ~1e6
    pairs is HBM-hostile; traceback runs host-side for final winners only).

A Pallas implementation of the same recurrence lives in
peppan_tpu/ops/kernels/banded_sw.py; this scan version is the portable
reference path and the fallback on CPU.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

NEG = -(10 ** 6)


@functools.lru_cache(maxsize=None)
def dna_scorer(match: int = 2, mismatch: int = -3) -> Callable:
    """Arithmetic DNA substitution scores (no gather): A/C/G/T exact match
    scores `match`, mismatch `mismatch`, any N involvement 0, any PAD -100.
    Must agree with io.alphabet.dna_score_matrix."""

    def scorer(qc: jax.Array, tc: jax.Array) -> jax.Array:
        is_pad = (qc >= 5) | (tc >= 5)
        is_n = (qc == 4) | (tc == 4)
        s = jnp.where(qc == tc, match, mismatch)
        s = jnp.where(is_n, 0, s)
        return jnp.where(is_pad, -100, s).astype(jnp.int32)

    return scorer


def matrix_scorer(submat: np.ndarray) -> Callable:
    """Generic substitution-matrix scorer (protein / BLOSUM62) via gather.

    Results are cached on the matrix bytes: the returned callable is a jit
    static arg, so reusing the same function object avoids recompiles.
    """
    return _matrix_scorer_cached(submat.astype(np.int32).tobytes(),
                                 submat.shape[0])


@functools.lru_cache(maxsize=None)
def _matrix_scorer_cached(submat_bytes: bytes, a: int) -> Callable:
    flat = jnp.asarray(np.frombuffer(submat_bytes, dtype=np.int32))

    def scorer(qc: jax.Array, tc: jax.Array) -> jax.Array:
        return jnp.take(flat, qc * a + tc, mode="clip")

    return scorer


def _shift_right(v: jax.Array, fill) -> jax.Array:
    return jnp.concatenate(
        [jnp.full_like(v[..., :1], fill), v[..., :-1]], axis=-1)


def _shift_left(v: jax.Array, fill) -> jax.Array:
    return jnp.concatenate(
        [v[..., 1:], jnp.full_like(v[..., :1], fill)], axis=-1)


@functools.partial(jax.jit, static_argnames=("scorer", "gap_open",
                                             "gap_extend", "band", "c0",
                                             "with_stats"))
def sw_banded(q: jax.Array, t: jax.Array, *, scorer: Callable,
              gap_open: int = 5, gap_extend: int = 2, band: int = 128,
              c0: int = 0, with_stats: bool = True) -> dict:
    """Batched banded local alignment.

    q: int8[P, Mq]  queries, padded with the alphabet's PAD token
    t: int8[P, Mt]  targets, padded likewise
    Returns dict of int32[P]: score, qend, tend (+ qstart, tstart, matches,
    aln_len when with_stats).  Coordinates are 0-based inclusive; an empty
    alignment reports score 0 and end coords -1.
    """
    P, Mq = q.shape
    _, Mt = t.shape
    B = band
    if Mq < B:
        q = jnp.pad(q, ((0, 0), (0, B - Mq)), constant_values=5)
        Mq = B
    open_first = gap_open + gap_extend

    qi = q.astype(jnp.int32)
    trev = jnp.flip(t.astype(jnp.int32), axis=1)
    # pad so the per-step reversed-target slice is always in range
    trev = jnp.pad(trev, ((0, 0), (B - 1, B - 1)), constant_values=5)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)

    D = Mq + Mt - 1

    def i0_of(d):
        return jnp.clip((d - c0) // 2 - B // 2, 0, Mq - B)

    def step(carry, d):
        if with_stats:
            (H1, H2, E1, F1, SH1, SH2, SE1, SF1, best) = carry
        else:
            (H1, H2, E1, F1, best) = carry
        i0 = i0_of(d)
        d1 = i0 - i0_of(d - 1)
        d2 = i0 - i0_of(d - 2)

        qs = jax.lax.dynamic_slice(qi, (0, i0), (P, B))
        ts = jax.lax.dynamic_slice(trev, (0, Mt + B - 2 - d + i0), (P, B))
        sv = scorer(qs, ts)

        no1 = d1 == 1  # d-1 arrays already aligned for the "up" direction
        no2 = d2 == 1
        Hup = jnp.where(no1, H1, _shift_right(H1, 0))
        Fup = jnp.where(no1, F1, _shift_right(F1, NEG))
        Hleft = jnp.where(no1, _shift_left(H1, 0), H1)
        Eleft = jnp.where(no1, _shift_left(E1, NEG), E1)
        Hdiag = jnp.where(no2, H2, _shift_right(H2, 0))

        e_open = Hleft - open_first
        e_ext = Eleft - gap_extend
        En = jnp.maximum(e_open, e_ext)
        f_open = Hup - open_first
        f_ext = Fup - gap_extend
        Fn = jnp.maximum(f_open, f_ext)
        dv = Hdiag + sv
        Hn = jnp.maximum(jnp.maximum(dv, 0), jnp.maximum(En, Fn))

        if with_stats:
            ivec = i0 + lanes                    # (1, B) broadcasts over P
            jvec = d - ivec
            is_match = ((qs == ts) & (qs < 4) & (ts < 4)).astype(jnp.int32)

            def shsel(S1, S2):
                up = jnp.where(no1, S1, _shift_right(S1, 0))
                left = jnp.where(no1, _shift_left(S1, 0), S1)
                diag = jnp.where(no2, S2, _shift_right(S2, 0))
                return up, left, diag

            M_up, M_left, M_diag = shsel(SH1[0], SH2[0])
            A_up, A_left, A_diag = shsel(SH1[1], SH2[1])
            QS_up, QS_left, QS_diag = shsel(SH1[2], SH2[2])
            TS_up, TS_left, TS_diag = shsel(SH1[3], SH2[3])

            def sleft(S):
                return jnp.where(no1, _shift_left(S, 0), S)

            def sright(S):
                return jnp.where(no1, S, _shift_right(S, 0))

            eo = e_open >= e_ext
            SEn = [jnp.where(eo, M_left, sleft(SE1[0])),
                   jnp.where(eo, A_left, sleft(SE1[1])) + 1,
                   jnp.where(eo, QS_left, sleft(SE1[2])),
                   jnp.where(eo, TS_left, sleft(SE1[3]))]
            fo = f_open >= f_ext
            SFn = [jnp.where(fo, M_up, sright(SF1[0])),
                   jnp.where(fo, A_up, sright(SF1[1])) + 1,
                   jnp.where(fo, QS_up, sright(SF1[2])),
                   jnp.where(fo, TS_up, sright(SF1[3]))]

            # fresh alignment when the diagonal source was an empty cell
            fresh = Hdiag == 0
            Mdv = jnp.where(fresh, 0, M_diag) + is_match
            Adv = jnp.where(fresh, 0, A_diag) + 1
            QSdv = jnp.where(fresh, ivec, QS_diag)
            TSdv = jnp.where(fresh, jvec, TS_diag)

            pos = Hn > 0
            use_diag = (dv == Hn) & pos
            use_e = (~use_diag) & (En == Hn) & pos

            def pick(dvv, evv, fvv):
                x = jnp.where(use_e, evv, fvv)
                x = jnp.where(use_diag, dvv, x)
                return jnp.where(pos, x, 0)

            SHn = [pick(Mdv, SEn[0], SFn[0]),
                   pick(Adv, SEn[1], SFn[1]),
                   pick(QSdv, SEn[2], SFn[2]),
                   pick(TSdv, SEn[3], SFn[3])]

            rowbest = jnp.max(Hn, axis=1)
            lane = jnp.argmax(Hn, axis=1)
            upd = rowbest > best[0]

            def at_lane(S):
                return jnp.take_along_axis(S, lane[:, None], axis=1)[:, 0]

            iv = jnp.broadcast_to(ivec, Hn.shape)
            jv = jnp.broadcast_to(jvec, Hn.shape)
            newbest = (
                jnp.where(upd, rowbest, best[0]),
                jnp.where(upd, at_lane(iv), best[1]),      # qend
                jnp.where(upd, at_lane(jv), best[2]),      # tend
                jnp.where(upd, at_lane(SHn[0]), best[3]),  # matches
                jnp.where(upd, at_lane(SHn[1]), best[4]),  # aln_len
                jnp.where(upd, at_lane(SHn[2]), best[5]),  # qstart
                jnp.where(upd, at_lane(SHn[3]), best[6]),  # tstart
            )
            carry = (Hn, H1, En, Fn,
                     tuple(SHn), SH1, tuple(SEn), tuple(SFn), newbest)
        else:
            rowbest = jnp.max(Hn, axis=1)
            lane = jnp.argmax(Hn, axis=1)
            upd = rowbest > best[0]
            ivec = i0 + lanes
            iv = jnp.broadcast_to(ivec, Hn.shape)
            jv = jnp.broadcast_to(d - ivec, Hn.shape)

            def at_lane(S):
                return jnp.take_along_axis(S, lane[:, None], axis=1)[:, 0]

            newbest = (
                jnp.where(upd, rowbest, best[0]),
                jnp.where(upd, at_lane(iv), best[1]),
                jnp.where(upd, at_lane(jv), best[2]),
            )
            carry = (Hn, H1, En, Fn, newbest)
        return carry, None

    # derive the init carry from the input so it inherits the input's
    # device-varying type under shard_map (a plain jnp.zeros would be
    # "unvarying" and trip scan's carry type check)
    zrow = qi[:, :1] * 0 + trev[:, :1] * 0  # varies over every axis q or t does
    zeros = jnp.broadcast_to(zrow, (P, B)).astype(jnp.int32)
    negs = zeros + NEG
    pz = zrow[:, 0]
    pm1 = pz - 1
    if with_stats:
        s4 = (zeros, zeros, zeros, zeros)
        init = (zeros, zeros, negs, negs, s4, s4, s4, s4,
                (pz, pm1, pm1, pz, pz, pz, pz))
    else:
        init = (zeros, zeros, negs, negs, (pz, pm1, pm1))

    carry, _ = jax.lax.scan(step, init, jnp.arange(D, dtype=jnp.int32))
    best = carry[-1]
    out = {"score": best[0], "qend": best[1], "tend": best[2]}
    if with_stats:
        out.update(matches=best[3], aln_len=best[4],
                   qstart=best[5], tstart=best[6])
    return out
