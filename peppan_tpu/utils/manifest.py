"""Phase-granular resume — PEPPAN's ``--continue`` equivalent.

Reference behaviour (SURVEY.md §5.3/§5.4; mount empty at build time):
each phase writes named intermediates; on restart with --continue, phases
whose outputs exist are skipped.  Here that contract is explicit: a JSON
manifest records, per phase, a content hash of (input files, config knobs
that phase depends on); phase payloads are .npz bundles.  A phase is
reused only when its hash matches — stale intermediates can never leak
into a run with changed inputs or thresholds (stricter than the
reference's existence check).
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np


class PhaseCache:
    def __init__(self, cache_dir: str, input_paths: list, cfg_repr: str,
                 enabled: bool):
        self.dir = cache_dir
        self.enabled = enabled
        h = hashlib.sha256()
        for p in sorted(input_paths):
            st = os.stat(p)
            h.update(p.encode())
            h.update(str((st.st_size, int(st.st_mtime))).encode())
        h.update(cfg_repr.encode())
        self.base_hash = h.hexdigest()[:24]
        self.manifest_path = os.path.join(cache_dir, "manifest.json")
        self.manifest: dict = {}
        if enabled and os.path.exists(self.manifest_path):
            try:
                self.manifest = json.load(open(self.manifest_path))
            except Exception:
                self.manifest = {}

    def _key(self, phase: str) -> str:
        return f"{phase}:{self.base_hash}"

    def load(self, phase: str) -> dict | None:
        """Return the stored arrays+meta for a phase, or None."""
        if not self.enabled:
            return None
        ent = self.manifest.get(phase)
        if not ent or ent.get("key") != self._key(phase):
            return None
        path = os.path.join(self.dir, ent["file"])
        if not os.path.exists(path):
            return None
        with np.load(path, allow_pickle=True) as z:
            out = {k: z[k] for k in z.files}
        meta = ent.get("meta")
        if meta is not None:
            out["__meta__"] = meta
        return out

    def store(self, phase: str, arrays: dict, meta=None) -> None:
        if not self.enabled:
            return
        os.makedirs(self.dir, exist_ok=True)
        fname = f"{phase}.npz"
        np.savez_compressed(os.path.join(self.dir, fname), **arrays)
        self.manifest[phase] = {"key": self._key(phase), "file": fname,
                                "meta": meta}
        with open(self.manifest_path, "w") as fh:
            json.dump(self.manifest, fh, indent=1)


class LaunchCache:
    """Launch-granular resume INSIDE a long device phase (SURVEY §5.4's
    tile checkpointing applied to the genome-map launch grid).

    The genome-map phase at pod scale runs minutes-to-hours of kernel
    launches; a backend stall mid-phase would void all of them under the
    phase-granular cache alone.  Each launch's unpacked stats arrays
    persist under a deterministic name; a manifest binds the directory to
    the owning phase's content hash, so intermediates from different
    inputs/config can never leak in (same strictness as PhaseCache).
    Cleared by the pipeline once the owning phase commits.
    """

    def __init__(self, cache_dir: str, key: str, enabled: bool = True):
        self.dir = cache_dir
        self.key = key
        self.enabled = enabled
        self.manifest_path = os.path.join(cache_dir, "launches.json")
        if not enabled:
            return
        os.makedirs(cache_dir, exist_ok=True)
        stale = True
        if os.path.exists(self.manifest_path):
            try:
                stale = json.load(open(self.manifest_path)) \
                    .get("key") != key
            except Exception:
                stale = True
        if stale:
            for f in os.listdir(cache_dir):
                if f.endswith(".npz"):
                    os.remove(os.path.join(cache_dir, f))
            with open(self.manifest_path, "w") as fh:
                json.dump({"key": key}, fh)

    def load(self, name: str) -> dict | None:
        if not self.enabled:
            return None
        path = os.path.join(self.dir, f"{name}.npz")
        if not os.path.exists(path):
            return None
        try:
            with np.load(path) as z:
                return {k: z[k] for k in z.files}
        except Exception:
            return None

    def store(self, name: str, arrays: dict) -> None:
        if not self.enabled:
            return
        path = os.path.join(self.dir, f"{name}.npz")
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:    # file object: savez must not
            np.savez(fh, **arrays)     # append another .npz to the name
        os.replace(tmp, path)          # atomic: a stall mid-write cannot
        #                                leave a truncated launch behind

    def clear(self) -> None:
        if not self.enabled or not os.path.isdir(self.dir):
            return
        for f in os.listdir(self.dir):
            if f.endswith(".npz") or f == "launches.json":
                os.remove(os.path.join(self.dir, f))
        try:
            os.rmdir(self.dir)
        except OSError:
            pass
