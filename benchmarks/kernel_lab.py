"""Kernel lab: cache-proof throughput of every banded-SW backend on TPU.

Run WITHOUT JAX_PLATFORMS=cpu (i.e. on the axon TPU).  Uses bench.py's
slope methodology: k kernels chained in one jit with distinct inputs per
repetition; reported rate = slope between k=3 and k=1 so dispatch/fetch
overhead cancels.  Prints one JSON line per variant.

Usage: timeout 900 python benchmarks/kernel_lab.py [variant ...]
Variants: scan_score scan_stats pallas_v1 pallas_v2
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

P, M, B = 4096, 1024, 128


def main(variants) -> None:
    from peppan_tpu.utils import jaxinit
    jaxinit.setup_cache()
    import jax

    from peppan_tpu.ops import sw
    from peppan_tpu.ops.kernels.banded_sw import sw_banded_scores_pallas
    from peppan_tpu.ops.kernels.banded_sw_v2 import sw_banded_scores_pallas_v2

    rng = np.random.default_rng(0)

    def make_inputs(n):
        out = []
        for _ in range(n):
            q = rng.integers(0, 4, (P, M)).astype(np.int8)
            t = q.copy()
            mask = rng.random(t.shape) < 0.05
            t[mask] = (t[mask] + 1) % 4
            out.append((jax.device_put(q),
                        jax.device_put(sw.prep_target_tokens(t))))
        return out

    ins = make_inputs(4)

    def body_of(variant):
        if variant == "scan_score":
            return lambda qq, tt: sw.sw_banded(
                qq, tt, scorer=sw.dna_scorer(), band=B,
                with_stats=False)["score"]
        if variant == "scan_stats":
            return lambda qq, tt: sw.sw_banded(
                qq, tt, scorer=sw.dna_scorer(), band=B,
                with_stats=True)["score"]
        if variant.startswith("scan_stats_u"):   # e.g. scan_stats_u4
            u = int(variant[len("scan_stats_u"):])
            return lambda qq, tt: sw.sw_banded(
                qq, tt, scorer=sw.dna_scorer(), band=B,
                with_stats=True, unroll=u)["score"]
        if variant == "pallas_v1":
            return lambda qq, tt: sw_banded_scores_pallas(qq, tt, band=B)
        if variant == "pallas_v2":
            return lambda qq, tt: sw_banded_scores_pallas_v2(qq, tt, band=B)
        if variant == "pallas_stats":
            from peppan_tpu.ops.kernels.banded_sw_v2 import (
                sw_banded_stats_pallas_v2)
            return lambda qq, tt: sw_banded_stats_pallas_v2(
                qq, tt, band=B)[0]
        if variant.startswith("pallas_v2_bp"):   # e.g. pallas_v2_bp256
            bp = int(variant[len("pallas_v2_bp"):])
            return lambda qq, tt: sw_banded_scores_pallas_v2(
                qq, tt, band=B, block_p=bp)
        if variant.startswith("pallas_v2_c"):    # e.g. pallas_v2_c16
            ch = int(variant[len("pallas_v2_c"):])
            return lambda qq, tt: sw_banded_scores_pallas_v2(
                qq, tt, band=B, chunk=ch)
        if variant == "lanes":
            from peppan_tpu.ops.kernels.banded_sw_lab import (
                sw_banded_scores_lanes)
            return lambda qq, tt: sw_banded_scores_lanes(qq, tt, band=B)
        if variant.startswith("lab_"):
            # lab_<state>_<token>[_defer][_bp<N>][_c<N>], e.g.
            # lab_i16_i8, lab_i32_i8, lab_i16_i16_defer, lab_i16_i8_bp256
            from peppan_tpu.ops.kernels.banded_sw_lab import (
                sw_banded_scores_lab)
            parts = variant.split("_")[1:]
            dt = {"i32": "int32", "i16": "int16", "i8": "int8"}
            kw = dict(state_dtype=dt[parts[0]], token_dtype=dt[parts[1]])
            for p in parts[2:]:
                if p == "defer":
                    kw["defer_hmax"] = True
                elif p == "fold":
                    kw["fold_shift"] = True
                elif p == "derive":
                    kw["derive_ts"] = True
                elif p.startswith("u"):
                    kw["loop_unroll"] = int(p[1:])
                elif p.startswith("bp"):
                    kw["block_p"] = int(p[2:])
                elif p.startswith("c"):
                    kw["chunk"] = int(p[1:])
            return lambda qq, tt: sw_banded_scores_lab(qq, tt, band=B, **kw)
        raise SystemExit(f"unknown variant {variant}")

    def time_chain(body, k):
        @jax.jit
        def f(qq, tt):
            acc = 0
            for i in range(k):
                acc = acc + body((qq + i) % 4, tt)
            return acc[:1]

        np.asarray(f(*ins[0]))
        t0 = time.perf_counter()
        for (qq, tt) in ins[1:]:
            np.asarray(f(qq, tt))
        return (time.perf_counter() - t0) / 3

    lane_cells = P * (2 * M - 1) * B
    for variant in variants:
        body = body_of(variant)
        try:
            per_kernel = (time_chain(body, 3) - time_chain(body, 1)) / 2
            gcups = lane_cells / per_kernel / 1e9
            print(json.dumps({"variant": variant,
                              "gcells_per_s": round(gcups, 1)}),
                  flush=True)
        except Exception as ex:  # noqa: BLE001 — lab tool, report and go on
            print(json.dumps({"variant": variant,
                              "error": repr(ex)[:300]}), flush=True)


if __name__ == "__main__":
    args = sys.argv[1:] or ["scan_score", "scan_stats", "pallas_v2"]
    main(args)
