"""Device mesh setup for the ('data', 'db') SPMD layout.

SURVEY.md §2.3/§5.8: the framework's parallelism is a single SPMD program
over a 2-D mesh — query gene batches stream over the 'data' axis, the
gene/genome database rows shard over the 'db' axis.  Collectives (psum /
all_gather over 'db' for best-hit merges, ppermute for halo exchange in the
long-target tiling) compile onto ICI within a slice.  There is no reference
analog: PEPPAN's parallelism is multiprocessing.Pool + subprocess
(SURVEY.md §3.1) and is replaced wholesale.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, db: int | None = None,
              devices=None) -> Mesh:
    """Build a ('data', 'db') mesh over the available devices.

    With no sizes given, factors the device count as close to square as
    possible with db <= data (DB shards want to stay coarse so the replica
    set for each query batch is small).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None and db is None:
        db = 1
        for f in range(int(np.sqrt(n)), 0, -1):
            if n % f == 0:
                db = f
                break
        data = n // db
    elif data is None:
        data = n // db
    elif db is None:
        db = n // data
    if data * db != n:
        raise ValueError(f"mesh {data}x{db} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, db)
    return Mesh(dev_array, ("data", "db"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def db_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("db"))
