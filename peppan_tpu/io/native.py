"""ctypes bridge to the native tokenizer (native/tokenizer.cpp).

Builds the shared library on first use (g++ -O3, cached next to the
source, keyed on a source hash) and falls back to pure Python when the
toolchain or build is unavailable — io.gff uses `fasta_tokenize` opportunistically.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "tokenizer.cpp")


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        src = open(_SRC, "rb").read()
        tag = hashlib.sha256(src).hexdigest()[:16]
        cache = os.path.join(os.path.expanduser("~"), ".cache",
                             "peppan_tpu_native")
        os.makedirs(cache, exist_ok=True)
        so = os.path.join(cache, f"libpeppan_native_{tag}.so")
        if not os.path.exists(so):
            tmp = so + ".build"
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", tmp, _SRC],
                check=True, capture_output=True)
            os.replace(tmp, so)
        lib = ctypes.CDLL(so)
        lib.pt_tokenize_dna.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")]
        lib.pt_fasta_tokenize.restype = ctypes.c_int64
        lib.pt_fasta_tokenize.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int64]
        lib.pt_sw_traceback.restype = ctypes.c_int64
        lib.pt_sw_traceback.argtypes = [
            np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def tokenize_dna(seq: bytes) -> np.ndarray | None:
    lib = _build_and_load()
    if lib is None:
        return None
    out = np.empty(len(seq), dtype=np.int8)
    lib.pt_tokenize_dna(seq, len(seq), out)
    return out


_OP_LETTER = "MID"


def sw_traceback(q: np.ndarray, t: np.ndarray, submat: np.ndarray,
                 gap_open: int, gap_extend: int,
                 n_real_tokens: int = 4):
    """Native full-matrix SW traceback; returns (stats dict, cigar) or
    None when the toolchain is unavailable.  Bit-exact vs
    ops.sw_oracle.sw_traceback (tested); ~100x faster, which is what makes
    the two-pass CIGAR refinement of claimed regions affordable."""
    lib = _build_and_load()
    if lib is None:
        return None
    q = np.ascontiguousarray(q, np.int8)
    t = np.ascontiguousarray(t, np.int8)
    m, n = len(q), len(t)
    if m == 0 or n == 0:
        return ({"score": 0, "qstart": 0, "qend": -1, "tstart": 0,
                 "tend": -1, "matches": 0, "aln_len": 0}, [])
    sm = np.ascontiguousarray(submat, np.int32)
    stats = np.zeros(7, np.int32)
    cap = m + n + 2
    ops = np.zeros(cap, np.uint8)
    lens = np.zeros(cap, np.int32)
    work = np.empty(3 * (m + 1) * (n + 1), np.int8)
    nruns = lib.pt_sw_traceback(q, m, t, n, sm, sm.shape[0],
                                gap_open, gap_extend, n_real_tokens,
                                stats, ops, lens, work)
    if nruns < 0:
        return None
    cigar = [(_OP_LETTER[int(ops[i])], int(lens[i])) for i in range(nruns)]
    keys = ("score", "qstart", "qend", "tstart", "tend", "matches",
            "aln_len")
    return ({k: int(stats[i]) for i, k in enumerate(keys)}, cigar)


def fasta_tokenize(buf: bytes, max_contigs: int = 1 << 16) -> dict | None:
    """Parse a FASTA byte buffer -> {names, tokens, offsets} or None."""
    lib = _build_and_load()
    if lib is None:
        return None
    n = len(buf)
    tokens = np.empty(max(n, 1), dtype=np.int8)
    starts = np.empty(max_contigs + 1, dtype=np.int64)
    name_starts = np.empty(max_contigs, dtype=np.int64)
    name_lens = np.empty(max_contigs, dtype=np.int32)
    nc = lib.pt_fasta_tokenize(buf, n, tokens, starts, name_starts,
                               name_lens, max_contigs)
    if nc < 0:
        return None
    names = [buf[name_starts[i]:name_starts[i] + name_lens[i]].decode(
        "ascii", "replace") for i in range(nc)]
    total = int(starts[nc])
    return {
        "names": names,
        "tokens": tokens[:total].copy(),
        "offsets": starts[:nc + 1].copy(),
    }
