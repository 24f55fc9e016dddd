"""Chunked device->host fetch helper for the tunnelled TPU backend.

Measured behaviour (2026-08-17): fetch latency is dominated by RANDOM
per-transfer stalls that look like ~200-300 s connection backoffs — an
8 MB fetch stalled 199 s while the next 34 MB fetch took 1 s.  Fewer,
larger fetches therefore minimize expected stall count, so chunking is
DISABLED by default (the helper remains for environments where size
itself is the cliff).  jaxinit.setup_cache() performs one small warmup
fetch at startup to absorb a stall at a predictable point.
"""

from __future__ import annotations

import numpy as np

CHUNK_BYTES = 256 << 20   # effectively off; see module docstring


_copy_async_warned = False


def copy_async(x) -> None:
    """Start x's device->host copy without blocking (jax.Array
    copy_to_host_async).  Launch loops call this on each result handle
    as it is enqueued so the later fetch loop completes from the local
    buffer instead of paying one serialized tunnel round trip per
    launch; backends without async copies just fetch synchronously.

    The copy is a speculative optimization, so no exception may abort
    the caller's launch phase (the tunnel throws transient errors
    during its documented ~200-300 s stalls and the later synchronous
    fetch self-heals).  But a REAL error must not vanish silently
    either — anything beyond 'backend lacks async copies' logs once per
    process so the eventual fetch failure has a visible cause nearby."""
    global _copy_async_warned
    try:
        x.copy_to_host_async()
    except (AttributeError, NotImplementedError):
        pass                      # backend simply lacks async copies
    except Exception as e:
        if not _copy_async_warned:
            _copy_async_warned = True
            import logging
            logging.getLogger("peppan_tpu").warning(
                "async device->host copy failed (%s: %s); falling back "
                "to synchronous fetches — further failures suppressed",
                type(e).__name__, e)


def fetch_np(x, chunk_bytes: int = CHUNK_BYTES) -> np.ndarray:
    """np.asarray(x), sliced along axis 0 when above chunk_bytes.

    Multi-process: an array sharded across processes is not fully
    addressable and np.asarray would throw — gather it to every process
    first (the §5.8 federated path; every host runs the same program, so
    every host needs the same host-side values)."""
    if not getattr(x, "is_fully_addressable", True):
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    nbytes = x.nbytes
    if nbytes <= chunk_bytes or x.ndim == 0 or x.shape[0] <= 1:
        return np.asarray(x)
    row_bytes = max(nbytes // x.shape[0], 1)
    rows = max(int(chunk_bytes // row_bytes), 1)
    parts = [np.asarray(x[i:i + rows]) for i in range(0, x.shape[0], rows)]
    return np.concatenate(parts, axis=0)
