"""Empirical VPU int32 ceiling probe.

BASELINE.md's banded-SW speed-of-light (460-490 Gcell/s at 14-15 ALU
ops/cell) is DERIVED from an assumed 4 int32 ALUs x (8x128) VPU lanes at
the MXU-inferred clock.  This probe MEASURES the achievable elementwise
int32 op rate with the same cache-proof slope method bench.py uses: a
long max/sub dependency chain (the exact op mix of the SW gap
recurrence) fused by XLA over a VMEM-tile-sized array, 256 ops per
element per pass so HBM traffic is negligible (8 MB moved vs ~40 us of
ALU work per pass at the derived peak).

The chain is strictly data-dependent (x feeds the next op) like the DP
recurrence itself, so this measures the sustainable dependent-op rate —
the correct ceiling for a wavefront kernel, where each half-step's ops
form a dependency chain, not an instruction-parallel soup.  An
independent 4-stream variant (ILP across four chains) bounds how much
of the 4-ALU issue width dependent chains leave on the table.

The `pallas_dep` variant (round 5, verdict weak #6) runs the SAME
two-stream dependent chain inside a minimal Mosaic kernel — state as
SSA-carried (128, 128) register tiles through a fully-unrolled loop,
exactly the production kernel's structure minus its shifts/slices — so
the ceiling is measured under MOSAIC's scheduler, not XLA's issue
pattern.  If pallas_dep lands near dep_chain, the ~261 G score-mode
ceiling binds hand-scheduled kernels too and the production kernel's
~72% position is against a real wall; if it lands materially higher,
the residual gap is schedulable and worth another kernel round.

Usage: timeout 900 python benchmarks/vpu_probe.py
Prints one JSON line per variant: ops/s and the implied SW score-mode
ceiling at 14 ALU-equivalents per lane-cell.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPE = (1024, 1024)      # 4 MB int32: one fusion's working set
CHAIN = 256               # dependent max/sub pairs per element per pass


def main() -> None:
    from peppan_tpu.utils import jaxinit
    jaxinit.setup_cache()
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    ins = [jax.device_put(rng.integers(0, 1 << 20, SHAPE).astype(np.int32))
           for _ in range(4)]
    consts = rng.integers(1, 7, CHAIN).astype(np.int32).tolist()

    def dep_chain(x):
        # (y, z) <- (max(y - c, z), y): 2 ALU ops per link, strictly
        # dependent and not algebraically reducible (the SW recurrence's
        # E/H update shape — two mutually-fed streams)
        y, z = x, x + 7
        for c in consts:
            y, z = jnp.maximum(y - c, z), y
        return y + z

    def ilp4(x):
        # four independent two-stream chains interleaved: exposes
        # instruction-level parallelism to the 4 ALUs; CHAIN//4 links
        # each so total op count matches dep_chain
        ys = [x, x + 1, x + 2, x + 3]
        zs = [x + 4, x + 5, x + 6, x + 7]
        for c in consts[: CHAIN // 4]:
            for i in range(4):
                ys[i], zs[i] = jnp.maximum(ys[i] - c, zs[i]), ys[i]
        return sum(ys) + sum(zs)

    REPS = 64   # in-jit fori_loop reps: one pass must be ~50+ ms of ALU
    #             work or per-call tunnel jitter (tens of ms) swamps the
    #             k-slope (first probe revision measured NEGATIVE slopes)

    # --- Mosaic-lowered variant: the same chain inside a pallas kernel --
    pallas_entry = None
    if jax.default_backend() not in ("cpu",):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        PB = 128                     # (128, 128) state tiles, 16 vregs
        PL_LINKS = 4096              # links per element per kernel call
        PL_CHUNK = 16                # links per unrolled loop step
        pl_consts = rng.integers(1, 7, PL_CHUNK).astype(np.int32).tolist()
        n_steps = PL_LINKS // PL_CHUNK

        def pl_kernel(x_ref, o_ref):
            y = x_ref[:, :]
            z = y + 7

            def step(i, st):
                y, z = st
                for c in pl_consts:
                    y, z = jnp.maximum(y - c, z), y
                return (y, z)

            y, z = jax.lax.fori_loop(0, n_steps, step, (y, z),
                                     unroll=n_steps)
            o_ref[:, :] = y + z

        @jax.jit
        def pallas_pass(x):
            # (128, 128) blocks: the state pair is 32 vregs, the same
            # register-budget regime as the production score kernel's
            # 5 carried tiles at block_p=128
            return pl.pallas_call(
                pl_kernel,
                grid=(x.shape[0] // PB, x.shape[1] // PB),
                in_specs=[pl.BlockSpec((PB, PB), lambda i, j: (i, j),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((PB, PB), lambda i, j: (i, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int32),
            )(x)

        pallas_entry = ("pallas_dep", pallas_pass, PL_LINKS)

    variants = [("dep_chain", dep_chain, CHAIN), ("ilp4", ilp4, CHAIN)]
    if pallas_entry is not None:
        variants.append(pallas_entry)
    for name, body, links in variants:
        def timed(k):
            @jax.jit
            def f(x):
                y = jax.lax.fori_loop(
                    0, k * REPS, lambda i, v: body(v) + (i & 1), x)
                return y[:1, :1]

            np.asarray(f(ins[0]))
            t0 = time.perf_counter()
            for x in ins[1:]:
                np.asarray(f(x))
            return (time.perf_counter() - t0) / 3

        per = (timed(3) - timed(1)) / 2
        ops = SHAPE[0] * SHAPE[1] * links * 2 * REPS
        rate = ops / per
        print(json.dumps({
            "variant": name,
            "int32_ops_per_s": round(rate / 1e9, 1),
            "implied_sw_score_ceiling_gcells": round(rate / 14 / 1e9, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
