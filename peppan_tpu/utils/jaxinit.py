"""Process-level JAX setup: persistent compilation cache.

The wavefront kernels compile once per (pair-count, width, band, mode)
shape; the persistent cache makes those compiles a one-time cost per
machine instead of per process (matters on the axon TPU backend where a
cold compile is seconds to minutes).  Called by pipeline.run, bench.py and
the CLI — never by the test suite (tests stay hermetic).
"""

from __future__ import annotations

import os

_done = False


def setup_cache(path: str | None = None) -> None:
    global _done
    if _done:
        return
    import jax

    # the machine's sitecustomize pins jax_platforms to the axon plugin;
    # let an explicit JAX_PLATFORMS env var win (e.g. CPU test runs)
    env_pf = os.environ.get("JAX_PLATFORMS")
    if env_pf:
        try:
            jax.config.update("jax_platforms", env_pf)
        except Exception:
            pass

    # only worth it (and only safe) for the tunnelled TPU backend: CPU AOT
    # entries written under different XLA flags SIGILL-warn on reload
    if jax.default_backend() in ("cpu",):
        _done = True
        return

    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "peppan_tpu_xla")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # the axon TPU backend compiles through a tunnel with high latency
        # variance — cache every compile, however small
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # cache is an optimization; never fail the run
        pass
    try:
        # warm the device<->host transfer path once: the tunnel's random
        # ~200-300 s connection stalls then land here instead of mid-phase
        import jax.numpy as jnp
        import numpy as _np
        _np.asarray(jnp.zeros((256, 1024), jnp.uint32))
    except Exception:
        pass
    _done = True
