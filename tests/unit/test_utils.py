"""Unit tests for the utils layer: metrics, manifest, fetch."""

import os
import json

import numpy as np

from peppan_tpu.utils import fetch, manifest, metrics


def test_metrics_counters_and_phase_log(tmp_path):
    metrics.reset()
    metrics.add("cells", 100)
    metrics.add("cells", 50)
    metrics.add("launches", 1)
    path = str(tmp_path / "phases.jsonl")
    log = metrics.PhaseLog(path)
    metrics.add("cells", 25)
    e1 = log.record("phase_a", 1.5)
    # PhaseLog reports per-phase DELTAS from its construction snapshot
    assert e1["cells"] == 25 and "launches" not in e1
    metrics.add("cells", 5)
    e2 = log.record("phase_b", 0.1)
    assert e2["cells"] == 5 and "launches" not in e2   # delta semantics
    lines = [json.loads(x) for x in open(path)]
    assert [x["phase"] for x in lines] == ["phase_a", "phase_b"]
    metrics.reset()
    assert metrics.snapshot() == {}


def test_phase_cache_roundtrip_and_invalidation(tmp_path):
    inp = tmp_path / "in.txt"
    inp.write_text("hello")
    cache = manifest.PhaseCache(str(tmp_path / "c"), [str(inp)], "cfgA",
                                enabled=True)
    assert cache.load("p1") is None
    cache.store("p1", {"x": np.arange(5)}, meta={"note": 1})
    got = cache.load("p1")
    assert np.array_equal(got["x"], np.arange(5))
    assert got["__meta__"] == {"note": 1}
    # different config repr -> miss
    cache2 = manifest.PhaseCache(str(tmp_path / "c"), [str(inp)], "cfgB",
                                 enabled=True)
    assert cache2.load("p1") is None
    # disabled -> always miss, store is a no-op
    cache3 = manifest.PhaseCache(str(tmp_path / "c2"), [str(inp)], "cfgA",
                                 enabled=False)
    cache3.store("p1", {"x": np.arange(3)})
    assert cache3.load("p1") is None
    assert not os.path.exists(str(tmp_path / "c2"))


def test_fetch_np_chunking():
    import jax.numpy as jnp

    x = jnp.arange(32 * 16, dtype=jnp.int32).reshape(32, 16)
    a = fetch.fetch_np(x)                       # default: single fetch
    b = fetch.fetch_np(x, chunk_bytes=128)      # forced chunked path
    assert np.array_equal(a, b)
    assert np.array_equal(a, np.arange(512).reshape(32, 16))
