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


def copy_async(x) -> None:
    """Start x's device->host copy without blocking (jax.Array
    copy_to_host_async).  Launch loops call this on each result handle
    as it is enqueued so the later fetch loop completes from the local
    buffer instead of paying one serialized tunnel round trip per
    launch; backends without async copies just fetch synchronously."""
    try:
        x.copy_to_host_async()
    except (AttributeError, NotImplementedError):
        # backend simply lacks async copies; real transfer errors must NOT
        # be swallowed here — they would otherwise resurface only at the
        # synchronous fetch, far from their cause
        pass


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
