"""CIGAR-level disruption calling for claimed regions (two-pass traceback).

SURVEY.md §7.3.3 / §2.1 "Pseudogene / disrupted-gene caller": PEPPAN reads
frameshifts and premature stops out of the alignment CIGARs its external
tools report; the round-1 engine approximated that with length-parity +
all-frames stop heuristics.  This module is the accurate second pass, run
for WINNING regions only (assign.greedy epilogue):

  exemplar tokens vs claimed locus tokens -> full-matrix affine traceback
  (native C++ pt_sw_traceback; python oracle fallback) -> walk the CIGAR:

  - an 'I'/'D' run whose length is not a multiple of 3 strictly inside the
    alignment is a FRAMESHIFT, positioned at the locus coordinate of the
    indel;
  - a matched codon of the exemplar reading frame that becomes a stop
    codon in the locus before `tail_frac` of the gene is a PREMATURE STOP
    (nonsense), positioned at its locus coordinate.

The caller decides pseudogene status from these events plus coverage.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..io import alphabet, native
from ..ops import sw_oracle


@dataclasses.dataclass
class Disruption:
    frameshift_pos: int       # locus-local coord of first frame-break, -1
    premature_stop_pos: int   # locus-local coord of first nonsense codon, -1
    aln_qcov: float           # exemplar coverage by the traceback alignment

    @property
    def disrupted(self) -> bool:
        return self.frameshift_pos >= 0 or self.premature_stop_pos >= 0


def region_traceback(exemplar: np.ndarray, locus: np.ndarray, *,
                     gap_open: int = 5, gap_extend: int = 2) -> tuple:
    """(stats dict, cigar) via the native kernel, python-oracle fallback."""
    submat = alphabet.dna_score_matrix().astype(np.int32)
    out = native.sw_traceback(exemplar, locus, submat, gap_open, gap_extend,
                              n_real_tokens=4)
    if out is not None:
        return out
    hit, cigar = sw_oracle.sw_traceback(np.asarray(exemplar),
                                        np.asarray(locus), submat,
                                        gap_open, gap_extend)
    stats = {"score": hit.score, "qstart": hit.qstart, "qend": hit.qend,
             "tstart": hit.tstart, "tend": hit.tend,
             "matches": hit.matches, "aln_len": hit.aln_len}
    return stats, cigar


def classify(stats: dict, cigar: list, exemplar: np.ndarray,
             locus: np.ndarray, *, tail_frac: float = 0.9,
             table_id: int = 11) -> Disruption:
    """Walk a qry-vs-locus CIGAR; report first frameshift / nonsense."""
    exl = len(exemplar)
    code = alphabet.genetic_code_table(table_id)
    qpos, tpos = int(stats["qstart"]), int(stats["tstart"])
    fs_pos, stop_pos = -1, -1
    cutoff = tail_frac * exl
    for (op, ln) in cigar:
        if op == "M":
            # exemplar codons fully inside this run, in the exemplar frame
            q0 = qpos + (-qpos) % 3
            while q0 + 2 < qpos + ln:
                if q0 + 3 <= cutoff:
                    off = tpos + (q0 - qpos)
                    c = locus[off:off + 3]
                    if (c < 4).all():
                        cid = 16 * int(c[0]) + 4 * int(c[1]) + int(c[2])
                        if code[cid] == alphabet.AA_STOP and stop_pos < 0:
                            stop_pos = off
                q0 += 3
            qpos += ln
            tpos += ln
        elif op == "I":              # query consumed, gap in locus
            if ln % 3 != 0 and fs_pos < 0:
                fs_pos = tpos
            qpos += ln
        else:                        # 'D': locus consumed, gap in exemplar
            if ln % 3 != 0 and fs_pos < 0:
                fs_pos = tpos
            tpos += ln
        if fs_pos >= 0 and stop_pos >= 0:
            break
    span = int(stats["qend"]) - int(stats["qstart"]) + 1
    return Disruption(frameshift_pos=fs_pos, premature_stop_pos=stop_pos,
                      aln_qcov=span / max(exl, 1))


def gapless_certified(exemplar: np.ndarray, locus: np.ndarray,
                      score: int) -> bool:
    """True iff the full-span GAPLESS interpretation achieves `score`.

    `score` is the recorded optimal (banded) SW score of this hit under
    the same scoring model (io.alphabet.dna_score_matrix defaults +
    affine gaps).  The optimal score is >= any particular alignment's, so
    equality certifies that a gapless end-to-end alignment IS optimal —
    and since the traceback prefers the diagonal on ties (ops.sw_oracle
    contract), the CIGAR pass would return all-M: no frameshift is
    possible and premature stops reduce to a frame-0 codon scan
    (scan_frame0).  Normative semantics: a region passing this test is
    BY DEFINITION gapless; only uncertified regions pay the DP pass.
    """
    if len(exemplar) != len(locus):
        return False
    submat = alphabet.dna_score_matrix().astype(np.int32)
    return int(submat[exemplar.astype(np.int64),
                      locus.astype(np.int64)].sum()) == int(score)


def scan_frame0(locus: np.ndarray, *, tail_frac: float = 0.9,
                table_id: int = 11) -> int:
    """First premature-stop locus coordinate in the exemplar frame, or -1.

    Exactly `classify` walking an all-M CIGAR anchored at (0, 0): codons
    0,3,6,... of the locus; a codon counts only while its end stays
    within ``tail_frac`` of the gene; codons containing N never count
    (translate maps them to X, mirroring classify's (c < 4).all() skip).
    """
    aa = alphabet.translate(locus, table_id)
    stops = np.flatnonzero(aa == alphabet.AA_STOP)
    cutoff = tail_frac * len(locus)
    stops = stops[(stops * 3 + 3) <= cutoff]
    return int(stops[0]) * 3 if len(stops) else -1


def stop_frames(seq: np.ndarray, *, tail_frac: float = 0.9,
                table_id: int = 11) -> int:
    """Number of reading frames (0..3) carrying a premature stop.

    0 -> no frame is disrupted (CDS regardless of the true frame);
    3 -> every frame is disrupted (pseudogene regardless);
    1..2 -> ambiguous: the CIGAR pass must resolve the true frame.
    """
    n = len(seq)
    if n < 30:
        return 0
    cutoff = int(tail_frac * (n // 3))
    k = 0
    for f in range(3):
        aa = alphabet.translate(seq[f:], table_id)
        if (aa[:cutoff] == alphabet.AA_STOP).any():
            k += 1
    return k
