"""Counters + structured phase log (SURVEY.md §5.1/§5.5).

The reference logs free-text progress lines to stderr; here every run also
emits `<prefix>.phases.jsonl` — one JSON object per phase with wall-clock
and the counters that accumulated during it (genes in, pairs seeded, pairs
aligned, DP lane-cell updates, launches) — exactly the quantities behind
the primary metrics in BASELINE.json:2.  Counters are a process-global
registry fed by the ops layer; `jax.profiler` traces can be layered on via
jax.named_scope tags already present in the kernels.
"""

from __future__ import annotations

import json
import threading
import time

_lock = threading.Lock()
_counters: dict = {}


def add(name: str, value: int | float) -> None:
    with _lock:
        _counters[name] = _counters.get(name, 0) + value


def low(name: str, value: int | float) -> None:
    """Keep the MINIMUM seen — watermark counters (e.g. the smallest
    ungapped anchor score among surviving map candidates, which says how
    much xdrop_floor headroom a run actually had)."""
    with _lock:
        _counters[name] = min(_counters.get(name, value), value)


def snapshot() -> dict:
    with _lock:
        return dict(_counters)


def reset() -> None:
    with _lock:
        _counters.clear()


class PhaseLog:
    """Writes one JSON line per phase: name, seconds, counter deltas."""

    def __init__(self, path: str | None):
        self.path = path
        self._last = snapshot()
        if path:
            open(path, "w").close()

    def record(self, phase: str, seconds: float) -> dict:
        now = snapshot()
        delta = {k: now[k] - self._last.get(k, 0) for k in now
                 if now[k] != self._last.get(k, 0)}
        self._last = now
        entry = {"phase": phase, "seconds": round(seconds, 4),
                 "ts": round(time.time(), 3), **delta}
        if self.path:
            with open(self.path, "a") as fh:
                fh.write(json.dumps(entry) + "\n")
        return entry
