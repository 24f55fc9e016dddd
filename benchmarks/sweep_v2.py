"""Static-param sweep for the v2 score kernel on the live TPU.

Usage: python benchmarks/sweep_v2.py [chunk:block_p ...]
Defaults to a small grid.  Uses the cache-proof slope methodology from
bench.py (distinct inputs, in-jit chaining, k=3 vs k=1 slope).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

P, M, B = 4096, 1024, 128


def main() -> None:
    # the correctness anchor below must come from the XLA scan, not the
    # kernel under test (sw_banded now dispatches score mode to Pallas)
    os.environ["PEPPAN_PALLAS_SCORES"] = "0"
    from peppan_tpu.utils import jaxinit
    jaxinit.setup_cache()
    import jax

    from peppan_tpu.ops import sw
    from peppan_tpu.ops.kernels.banded_sw_v2 import sw_banded_scores_pallas_v2

    configs = []
    for a in sys.argv[1:]:
        c, bp = a.split(":")
        configs.append((int(c), int(bp)))
    if not configs:
        configs = [(8, 128), (16, 128), (32, 128), (16, 256)]

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
    lane_cells = P * (2 * M - 1) * B

    # correctness anchor: scan engine scores on input 0
    ref = np.asarray(sw.sw_banded(ins[0][0], ins[0][1], scorer=sw.dna_scorer(),
                                  band=B, with_stats=False)["score"])

    def time_chain(body, k: int) -> float:
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

    for (c, bp) in configs:
        body = lambda qq, tt: sw_banded_scores_pallas_v2(  # noqa: E731
            qq, tt, band=B, chunk=c, block_p=bp)
        try:
            got = np.asarray(body(ins[0][0], ins[0][1]))
            ok = bool((got == ref).all())
            samples = []
            for _ in range(3):
                per = (time_chain(body, 3) - time_chain(body, 1)) / 2
                samples.append(lane_cells / per / 1e9)
            print(f"chunk={c:3d} block_p={bp:3d} bit_equal={ok} "
                  f"gcells={np.median(samples):7.1f}  (samples "
                  + " ".join(f"{s:.0f}" for s in samples) + ")", flush=True)
        except Exception as e:  # Mosaic rejections etc.
            print(f"chunk={c:3d} block_p={bp:3d} FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
