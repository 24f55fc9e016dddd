"""Multi-host bring-up (jax.distributed bootstrap).

SURVEY.md §5.8: multi-host runs bootstrap with jax.distributed (one process
per host, devices federated into one global mesh); all cross-chip traffic
stays in XLA collectives over ICI/DCN.  This environment exposes a single
chip, so the explicit-argument path is exercised by a real 2-process CPU
test (tests/unit/test_dist.py) and on pod slices via the standard
coordinator env vars.

In-phase checkpointing (SURVEY.md §5.4) lives in utils.manifest.LaunchCache,
wired into ops.pairs.verify_pairs and ops.genome_map — every long device
phase resumes at launch granularity under --continue.  (An earlier
TileRunner class here duplicated that role without a production call site
and was removed.)
"""

from __future__ import annotations


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed bootstrap.

    Explicit arguments (a coordinator address or a process count > 1) are
    a statement of intent: failures PROPAGATE, because silently degrading
    a typo'd coordinator address to a 1-process run would burn a pod-slice
    reservation on 1/N of the work (round-2 review finding).  Only the
    zero-argument auto-detect path tolerates a non-distributed
    environment, and double-initialization is a no-op on both paths.
    """
    import jax

    if num_processes is not None and num_processes <= 1:
        return
    # idempotence probe: the distributed global state only (touching
    # jax.process_count() here would initialize the XLA backend, which
    # must not happen before jax.distributed.initialize)
    try:
        if jax._src.distributed.global_state.client is not None:
            return
    except Exception:
        pass
    if coordinator is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError):
            # single-process environment without coordinator env vars
            pass
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes, process_id=process_id)
