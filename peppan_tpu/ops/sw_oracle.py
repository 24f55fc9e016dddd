"""Numpy reference implementation of banded affine-gap Smith-Waterman.

This is the correctness oracle for the TPU kernels (SURVEY.md §4.2.2): a
straightforward per-cell dynamic program over the full (i, j) matrix with a
band mask — structurally different from the device wavefront kernel, so shift
bugs in the kernel cannot replicate here.  It also provides the traceback
alignment used by phase-2 detail extraction (CIGARs for pseudogene calling),
mirroring what PEPPAN reads out of blastn/diamond tabular output
(reference: modules/uberBlast.py — mount empty; semantics per SURVEY.md §3.2).

Semantics fixed here, shared by every implementation in the framework:

- Local (Smith-Waterman) alignment, affine gaps: a gap of length L costs
  ``gap_open + L * gap_extend``.
- H-cell choice priority on ties: diagonal > E (gap in query / left) >
  F (gap in target / up) > reset-to-zero.
- E/F choice priority on ties: open > extend.
- Best cell: strictly greater score wins; ties keep the earlier cell in
  anti-diagonal-major order (d = i + j ascending, then i ascending) — the
  device kernel's natural scan order.
- Band: cell (i, j) is allowed iff i in [i0(d), i0(d) + band) where
  d = i + j and i0(d) = (d - c0)//2 - band//2, UNCLIPPED — exactly the lane
  geometry of the wavefront kernel (offsets j - i in (c0-band, c0+band]).
- Matches count aligned columns with equal tokens, both < n_real_tokens
  (4 for DNA: N never matches; 20 for protein: X/STOP never match).
  aln_len counts all alignment columns including gap columns.
  Coordinates are 0-based inclusive.
"""

from __future__ import annotations

import dataclasses

import numpy as np

NEG = -(10 ** 6)


@dataclasses.dataclass
class SwHit:
    score: int
    qstart: int
    qend: int
    tstart: int
    tend: int
    matches: int
    aln_len: int

    @property
    def identity(self) -> float:
        return self.matches / self.aln_len if self.aln_len else 0.0


def band_i0(d: int, band: int, c0: int) -> int:
    """Canonical band rule (must match ops.sw): rows [i0, i0+band) on
    anti-diagonal d, unclipped — covers offsets j-i in (c0-band, c0+band]."""
    return (d - c0) // 2 - band // 2


def sw_banded_ref(q: np.ndarray, t: np.ndarray, submat: np.ndarray,
                  gap_open: int, gap_extend: int, band: int = 1 << 30,
                  c0: int = 0, n_real_tokens: int = 4) -> SwHit:
    """Reference banded local alignment. O(m*n) python loops — tests only."""
    m, n = len(q), len(t)
    H = np.zeros((m + 1, n + 1), dtype=np.int64)
    E = np.full((m + 1, n + 1), NEG, dtype=np.int64)
    F = np.full((m + 1, n + 1), NEG, dtype=np.int64)
    # stats per matrix: matches, aln_len, qstart, tstart
    SH = np.zeros((m + 1, n + 1, 4), dtype=np.int64)
    SE = np.zeros((m + 1, n + 1, 4), dtype=np.int64)
    SF = np.zeros((m + 1, n + 1, 4), dtype=np.int64)
    # reset stats: empty alignment starting at (i, j)
    for i in range(m + 1):
        SH[i, :, 2] = i
    for j in range(n + 1):
        SH[:, j, 3] = j

    best = 0
    hit = SwHit(0, 0, -1, 0, -1, 0, 0)
    first_open = gap_open + gap_extend
    for d in range(m + n - 1):
        i0 = band_i0(d, band, c0)
        for i1 in range(max(i0, 0), min(i0 + band, m)):
            j1 = d - i1
            if not (0 <= j1 < n):
                continue
            i, j = i1 + 1, j1 + 1  # DP matrix coords (1-based)
            # E: gap in query (consume target char j1)
            e_open = H[i, j - 1] - first_open
            e_ext = E[i, j - 1] - gap_extend
            if e_open >= e_ext:
                E[i, j], SE[i, j] = e_open, SH[i, j - 1].copy()
            else:
                E[i, j], SE[i, j] = e_ext, SE[i, j - 1].copy()
            SE[i, j, 1] += 1
            # F: gap in target (consume query char i1)
            f_open = H[i - 1, j] - first_open
            f_ext = F[i - 1, j] - gap_extend
            if f_open >= f_ext:
                F[i, j], SF[i, j] = f_open, SH[i - 1, j].copy()
            else:
                F[i, j], SF[i, j] = f_ext, SF[i - 1, j].copy()
            SF[i, j, 1] += 1
            # H: max(0, diag, E, F) with priority diag > E > F > reset
            s = int(submat[q[i1], t[j1]])
            dv = H[i - 1, j - 1] + s
            hv = max(0, dv, E[i, j], F[i, j])
            H[i, j] = hv
            if hv <= 0:
                SH[i, j] = (0, 0, i, j)
            elif dv == hv:
                st = SH[i - 1, j - 1].copy()
                st[0] += 1 if (q[i1] == t[j1] and q[i1] < n_real_tokens
                               and t[j1] < n_real_tokens) else 0
                st[1] += 1
                SH[i, j] = st
            elif E[i, j] == hv:
                SH[i, j] = SE[i, j].copy()
            else:
                SH[i, j] = SF[i, j].copy()
            if H[i, j] > best:
                best = int(H[i, j])
                st = SH[i, j]
                hit = SwHit(best, int(st[2]), i1, int(st[3]), j1,
                            int(st[0]), int(st[1]))
    return hit


def sw_traceback(q: np.ndarray, t: np.ndarray, submat: np.ndarray,
                 gap_open: int, gap_extend: int,
                 n_real_tokens: int = 4) -> tuple:
    """Full-matrix local alignment with traceback.

    Returns (SwHit, cigar) where cigar is a list of (op, length) with op in
    'M' (match/mismatch column), 'I' (insertion in query = gap in target),
    'D' (deletion from query = gap in query/target char consumed).
    Convention matches BLAST-style qry-vs-sbj CIGARs that PEPPAN's rescorer
    walks (SURVEY.md §3.2).
    """
    m, n = len(q), len(t)
    H = np.zeros((m + 1, n + 1), dtype=np.int64)
    E = np.full((m + 1, n + 1), NEG, dtype=np.int64)
    F = np.full((m + 1, n + 1), NEG, dtype=np.int64)
    # choice codes: 0 reset, 1 diag, 2 E, 3 F ; E/F: 0 open, 1 extend
    CH = np.zeros((m + 1, n + 1), dtype=np.int8)
    CE = np.zeros((m + 1, n + 1), dtype=np.int8)
    CF = np.zeros((m + 1, n + 1), dtype=np.int8)
    first_open = gap_open + gap_extend
    best, bi, bj = 0, 0, 0
    for i in range(1, m + 1):
        Erow = E[i]
        for j in range(1, n + 1):
            e_open = H[i, j - 1] - first_open
            e_ext = Erow[j - 1] - gap_extend
            Erow[j] = max(e_open, e_ext)
            CE[i, j] = 0 if e_open >= e_ext else 1
            f_open = H[i - 1, j] - first_open
            f_ext = F[i - 1, j] - gap_extend
            F[i, j] = max(f_open, f_ext)
            CF[i, j] = 0 if f_open >= f_ext else 1
            dv = H[i - 1, j - 1] + int(submat[q[i - 1], t[j - 1]])
            hv = max(0, dv, Erow[j], F[i, j])
            if dv == hv and hv > 0:
                CH[i, j] = 1
            elif Erow[j] == hv and hv > 0:
                CH[i, j] = 2
            elif F[i, j] == hv and hv > 0:
                CH[i, j] = 3
            else:
                CH[i, j] = 0
                hv = max(hv, 0)
            H[i, j] = hv
            if hv > best:
                best, bi, bj = int(hv), i, j
    # traceback
    cigar: list = []
    i, j = bi, bj
    matches = aln_len = 0

    def push(op):
        nonlocal aln_len
        aln_len += 1
        if cigar and cigar[-1][0] == op:
            cigar[-1][1] += 1
        else:
            cigar.append([op, 1])

    state = "H"
    while i > 0 and j > 0:
        if state == "H":
            c = CH[i, j]
            if c == 0:
                break
            if c == 1:
                push("M")
                if (q[i - 1] == t[j - 1] and q[i - 1] < n_real_tokens
                        and t[j - 1] < n_real_tokens):
                    matches += 1
                i, j = i - 1, j - 1
            elif c == 2:
                state = "E"
            else:
                state = "F"
        elif state == "E":
            push("D")
            if CE[i, j] == 0:
                state = "H"
            j -= 1
        else:
            push("I")
            if CF[i, j] == 0:
                state = "H"
            i -= 1
    cigar.reverse()
    hit = SwHit(best, i, bi - 1, j, bj - 1, matches, aln_len)
    return hit, [(op, ln) for op, ln in cigar]
