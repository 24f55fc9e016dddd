"""Host-side semantic oracle: phases 3-7 re-implemented without JAX.

SURVEY.md §7.3.6 insurance policy: with the reference mount empty, the
pipeline's semantics need a second, structurally different implementation
so that (a) the device engine's DECISIONS (clusters, groups, hits,
regions) can be golden-diffed today, and (b) when the real PEPPAN becomes
available only ONE implementation needs reconciling.

Design rules:
  - numpy + the O(mn) full-matrix aligners only (native pt_sw_traceback
    for speed, sw_oracle as its own bit-equal fallback); no JAX, no
    minimizer seeding, no banding heuristics;
  - phase 5 mapping is EXHAUSTIVE: every exemplar vs every contig/strand
    via iterative best-hit masking — no seeds to miss, which also covers
    what the production protein stage recovers at oracle scale (run the
    production side with nucl_only=True when diffing);
  - the greedy assignment repeats the documented tie-breaks with naive
    O(n^2) scans (no heap, no bisect);
  - shared with production ON PURPOSE: token/alphabet conventions and
    io.writers (formatting is not under test; decisions are).

Scope: phases 3-7 on the DNA rail by default; ``run(nucl_only=False)``
(round 4) adds the protein rail — all-pairs full-matrix BLOSUM62 edges
in the similarity phase and a naive 6-frame translated search for
missing combos — mirroring where the production pipeline invokes its
DIAMOND-analog stages.  The iterative re-split hook and the CIGAR
disruption tree mirror assign/greedy semantics.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..io import alphabet, native
from ..io.tokens import GeneStore, GenomeStore
from ..ops import sw_oracle
from ..assign.greedy import Regions

DNA = alphabet.dna_score_matrix().astype(np.int32)
BLOSUM = alphabet.blosum62_matrix().astype(np.int32)


def _align(q: np.ndarray, t: np.ndarray, gap_open: int = 5,
           gap_extend: int = 2):
    """Full-matrix SW (stats + cigar): native fast path, python fallback."""
    out = native.sw_traceback(q, t, DNA, gap_open, gap_extend)
    if out is not None:
        return out
    hit, cigar = sw_oracle.sw_traceback(q, t, DNA, gap_open, gap_extend)
    return ({"score": hit.score, "qstart": hit.qstart, "qend": hit.qend,
             "tstart": hit.tstart, "tend": hit.tend,
             "matches": hit.matches, "aln_len": hit.aln_len}, cigar)


# --- phase 3: clustering (all-pairs, no sketching) -------------------------

def cluster(genes: GeneStore, *, identity: float = 0.9,
            coverage: float = 0.9) -> tuple:
    """(root, exemplar, exemplar_ids): single-linkage over verified edges.

    All-pairs alignment with a length-ratio prefilter (coverage of the
    longer sequence is impossible below `coverage` length ratio — a pure
    arithmetic bound, not a heuristic)."""
    n = genes.n_genes
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    toks = [genes.gene_tokens(i) for i in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            li, lj = len(toks[i]), len(toks[j])
            if min(li, lj) < coverage * max(li, lj):
                continue
            if find(i) == find(j):
                continue
            stats, _ = _align(toks[i], toks[j])
            if stats["aln_len"] == 0:
                continue
            ident = stats["matches"] / stats["aln_len"]
            qcov = (stats["qend"] - stats["qstart"] + 1) / li
            tcov = (stats["tend"] - stats["tstart"] + 1) / lj
            if ident >= identity and qcov >= coverage and tcov >= coverage:
                union(i, j)
    root = np.array([find(i) for i in range(n)], np.int64)
    # exemplar: longest member, then smallest index (no priority ranks)
    order = np.lexsort((np.arange(n), -genes.length.astype(np.int64)))
    ex_of_root: dict = {}
    for g in order:
        ex_of_root.setdefault(int(root[g]), int(g))
    exemplar = np.array([ex_of_root[int(r)] for r in root], np.int64)
    return root, exemplar, np.unique(exemplar)


# --- phase 4: similarity groups --------------------------------------------

def _translate_gene(genes: GeneStore, g: int, gtable: int = 11) -> np.ndarray:
    """Frame-0 AA tokens of a gene, trailing stop dropped — the oracle's
    naive mirror of ops.protein.translate_genes per-gene semantics."""
    aa = alphabet.translate(genes.gene_tokens(int(g)), gtable)
    if len(aa) and aa[-1] == alphabet.AA_STOP:
        aa = aa[:-1]
    return aa


def _align_aa(q: np.ndarray, t: np.ndarray, gap_open: int = 11,
              gap_extend: int = 1):
    """Full-matrix BLOSUM62 SW (stats + cigar), native or python."""
    out = native.sw_traceback(q, t, BLOSUM, gap_open, gap_extend,
                              n_real_tokens=20)
    if out is not None:
        return out
    hit, cigar = sw_oracle.sw_traceback(q, t, BLOSUM, gap_open, gap_extend,
                                        n_real_tokens=20)
    return ({"score": hit.score, "qstart": hit.qstart, "qend": hit.qend,
             "tstart": hit.tstart, "tend": hit.tend,
             "matches": hit.matches, "aln_len": hit.aln_len}, cigar)


def _murphy_kmers(aa: np.ndarray, k: int = 7) -> set:
    """Set of Murphy-10 reduced k-mers (tuples) over valid windows."""
    from ..ops.minimizers import MURPHY10
    red = MURPHY10[np.clip(aa, 0, 31).astype(np.int64)]
    out = set()
    for i in range(len(red) - k + 1):
        win = red[i:i + k]
        if (win < 10).all():
            out.add(bytes(win.tobytes()))
    return out


def similarity_groups(genes: GeneStore, exemplar: np.ndarray,
                      exemplar_ids: np.ndarray, *,
                      match_identity: float = 0.65,
                      match_prop: float = 0.5,
                      match_len: int = 0,
                      protein_identity: float | None = None,
                      gtable: int = 11) -> np.ndarray:
    """Component root per gene after connecting exemplars that align.

    protein_identity (round 4, production: pipeline._similarity_groups +
    ops.protein.protein_similar_pairs): when set, exemplar pairs whose
    full-matrix BLOSUM62 alignment reaches that AA identity with
    max-coverage >= match_prop also connect — the DIAMOND-equivalent
    protein pass, all-pairs with no Murphy seeding or banding (oracle
    edges ⊇ production's seeded ones; fixtures must keep decisions
    decisive under either)."""
    n = genes.n_genes
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    ids = [int(e) for e in exemplar_ids]
    toks = {e: genes.gene_tokens(e) for e in ids}
    aa = ({e: _translate_gene(genes, e, gtable) for e in ids}
          if protein_identity is not None else None)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            stats, _ = _align(toks[a], toks[b])
            joined = False
            if stats["aln_len"] > 0:
                ident = stats["matches"] / stats["aln_len"]
                qcov = (stats["qend"] - stats["qstart"] + 1) / len(toks[a])
                tcov = (stats["tend"] - stats["tstart"] + 1) / len(toks[b])
                cov_ok = max(qcov, tcov) >= match_prop
                if match_len > 0 and stats["aln_len"] >= match_len:
                    cov_ok = True
                if ident >= match_identity and cov_ok:
                    union(a, b)
                    joined = True
            if aa is not None and not joined and len(aa[a]) and len(aa[b]):
                pstats, _ = _align_aa(aa[a], aa[b])
                if pstats["aln_len"] > 0:
                    ident = pstats["matches"] / pstats["aln_len"]
                    qcov = ((pstats["qend"] - pstats["qstart"] + 1)
                            / len(aa[a]))
                    tcov = ((pstats["tend"] - pstats["tstart"] + 1)
                            / len(aa[b]))
                    if (ident >= protein_identity
                            and max(qcov, tcov) >= match_prop):
                        union(a, b)
    for g in range(n):
        union(int(exemplar[g]), g)
    return np.array([find(g) for g in range(n)], np.int64)


# --- phase 6: divergence model + paralog split (naive) ----------------------

def estimate_divergence(genes: GeneStore, group_root: np.ndarray,
                        n_genomes: int) -> tuple:
    """(expect[G,G], sigma): naive re-derivation of the production model
    (cluster/split.estimate_divergence semantics): per genome pair, the
    median 1-identity over members of shared SINGLE-COPY groups; missing
    pairs fill with max of the two marginal medians; sigma = 1.4826 * MAD
    of individual distances around their pair median (floor 0.01).

    Sampling differs by design: production measures the phase-4 candidate
    pairs it already verified; the oracle aligns EVERY cross-genome member
    pair of every single-copy group (full-matrix DP).  Fixtures for the
    golden diff must keep split decisions decisive under either sample."""
    members: dict = {}
    for gi, r in enumerate(group_root):
        members.setdefault(int(r), []).append(gi)
    by_pair: dict = {}
    for _r, mem in sorted(members.items()):
        gen = [int(genes.genome[i]) for i in mem]
        if len(set(gen)) < len(gen):
            continue                        # not single-copy
        for x in range(len(mem)):
            for y in range(x + 1, len(mem)):
                a, b = mem[x], mem[y]
                if gen[x] == gen[y]:
                    continue
                stats, _ = _align(genes.gene_tokens(a), genes.gene_tokens(b))
                if stats["aln_len"] == 0:
                    continue
                d = 1.0 - stats["matches"] / stats["aln_len"]
                key = (min(gen[x], gen[y]), max(gen[x], gen[y]))
                by_pair.setdefault(key, []).append(d)
    expect = np.zeros((n_genomes, n_genomes), np.float32)
    observed = np.eye(n_genomes, dtype=bool)
    meds, residuals = [], []
    for (ga, gb), ds in sorted(by_pair.items()):
        med = float(np.median(sorted(ds)))
        expect[ga, gb] = expect[gb, ga] = med
        observed[ga, gb] = observed[gb, ga] = True
        meds.append(med)
        residuals.extend(d - med for d in ds)
    overall = float(np.median(meds)) if meds else 0.05
    row_med = np.zeros(n_genomes, np.float32)
    for g in range(n_genomes):
        row = [expect[g, h] for h in range(n_genomes)
               if h != g and observed[g, h]]
        row_med[g] = float(np.median(row)) if row else overall
    for g in range(n_genomes):
        for h in range(n_genomes):
            if not observed[g, h]:
                expect[g, h] = max(row_med[g], row_med[h])
    np.fill_diagonal(expect, 0.0)
    sigma = (max(float(np.median(np.abs(residuals))) * 1.4826, 0.01)
             if residuals else 0.02)
    return expect, float(sigma)


def _leaves_under(child_l, child_r, node, n):
    if node < n:
        return [int(node)]
    return (_leaves_under(child_l, child_r, int(child_l[node]), n)
            + _leaves_under(child_l, child_r, int(child_r[node]), n))


def _pair_distance_matrix(seqs: list) -> np.ndarray:
    """Full-matrix DP all-pairs distance (1 - identity), float32-quantized
    like production's (1 - f32 identity) so knife-edge sums cannot differ."""
    n = len(seqs)
    dm = np.zeros((n, n), np.float64)
    for x in range(n):
        for y in range(x + 1, n):
            stats, _ = _align(seqs[x], seqs[y])
            d = (1.0 - stats["matches"] / stats["aln_len"]
                 if stats["aln_len"] > 0 else 1.0)
            dm[x, y] = dm[y, x] = np.float32(d)
    return dm


def _tree_components(dm: np.ndarray, gen: np.ndarray, expect: np.ndarray,
                     sigma: float, allowed_sigma: float) -> list:
    """NJ tree (interpreter-loop nj_ref) + the normative edge test: cut an
    unrooted edge when the closest cross-bipartition pair exceeds the mean
    genome-pair expectation + allowed_sigma * sigma.  Returns a component
    id per leaf."""
    from ..cluster import nj as njmod

    n = dm.shape[0]
    parent, _blen, cl, cr, root = njmod.nj_ref(dm)
    E = expect[np.ix_(gen, gen)]

    def edge_cut(amask):
        bmask = ~amask
        if not amask.any() or not bmask.any():
            return False
        cross = dm[np.ix_(amask, bmask)].astype(np.float32)
        stat = float(cross.min())
        exp = float(np.mean(E[np.ix_(amask, bmask)]))
        return stat > exp + allowed_sigma * sigma

    def mask_of(node):
        msk = np.zeros(n, dtype=bool)
        msk[_leaves_under(cl, cr, node, n)] = True
        return msk

    uf = list(range(2 * n - 1))

    def find(a):
        while uf[a] != a:
            uf[a] = uf[uf[a]]
            a = uf[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            uf[max(ra, rb)] = min(ra, rb)

    if not edge_cut(mask_of(int(cl[root]))):
        union(int(cl[root]), root)
        union(int(cr[root]), root)
    for x in range(2 * n - 2):
        if parent[x] < 0 or parent[x] == root:
            continue
        if not edge_cut(mask_of(x)):
            union(x, int(parent[x]))
    return [find(lf) for lf in range(n)]


def split_groups(genes: GeneStore, group_root: np.ndarray,
                 expect: np.ndarray, sigma: float, *,
                 allowed_sigma: float = 3.0) -> np.ndarray:
    """Naive filt_per_group: groups with a duplicated genome get a full
    all-pairs distance matrix (full-matrix DP), an interpreter-loop NJ
    tree (cluster.nj.nj_ref — the device scan's independent oracle), and
    the same normative edge test as cluster/split._cut_components (see
    _tree_components).  Relabeling matches production: the component
    holding the smallest gene id keeps the group label, the rest get
    fresh labels ordered by smallest member."""
    members: dict = {}
    for gi, r in enumerate(group_root):
        members.setdefault(int(r), []).append(gi)
    out = group_root.copy()
    next_label = int(group_root.max()) + 1
    for grp, mem in sorted(members.items()):
        gen = np.asarray([int(genes.genome[i]) for i in mem])
        if len(np.unique(gen)) >= len(gen) or len(mem) <= 2:
            continue
        dm = _pair_distance_matrix([genes.gene_tokens(i) for i in mem])
        comp = _tree_components(dm, gen, expect, sigma, allowed_sigma)
        if len(set(comp)) <= 1:
            continue
        order: dict = {}
        for leaf in np.argsort(np.asarray(mem)):
            c = comp[int(leaf)]
            if c not in order:
                order[c] = len(order)
        label_of = {c: (grp if o == 0 else next_label + o - 1)
                    for c, o in order.items()}
        for leaf, gidx in enumerate(mem):
            out[gidx] = label_of[comp[leaf]]
        next_label += len(order) - 1
    return out


# --- phase 5: exhaustive genome mapping -------------------------------------

@dataclasses.dataclass
class OracleHit:
    exemplar: int
    genome: int
    contig: int
    start: int   # 0-based inclusive, fwd strand
    end: int
    strand: int
    score: int
    identity: float
    qcov: float
    stitched: bool = False


def map_exemplars(genes: GeneStore, genomes: GenomeStore,
                  exemplar_ids: np.ndarray, *,
                  min_identity: float = 0.65, min_frag_len: int = 50,
                  stitch_gap: int = 300, max_hits_per_contig: int = 32,
                  min_hit_score: int = 26) -> list:
    """Iterative best-hit masking: align, record, mask, repeat.

    min_hit_score: the loop stops when the masked contig's OPTIMAL local
    score drops below this floor.  26 = one exact 13-mer (match=2) — the
    production path cannot seed a hit without at least one exact 13-mer
    run, and any such hit's alignment scores >= that segment's 26, so the
    masked-contig optimum stays >= 26 while any production-visible hit
    remains unmasked: the floor is EXACT w.r.t. the diff guarantee
    (oracle decisions ⊇ production decisions) FOR SEEDED MAPPING — the
    opt-in --exhaustive_fallback windowed sweep can surface hits with no
    13-mer run, so diffs against exhaustive-fallback runs must plumb
    min_hit_score=1 (round-3 advisor finding).  Not a heuristic.  Without
    it every non-homologous (exemplar, contig, strand) pair burned all
    max_hits_per_contig full-matrix DPs on ~25-scoring random best-hits
    whose spans never pass min_frag_len (measured: the 20-genome golden
    fixture's oracle map phase was 1332 s of the 24-minute total)."""
    hits: list = []
    for e in map(int, exemplar_ids):
        q = genes.gene_tokens(e)
        L = len(q)
        for ci in range(genomes.n_contigs):
            fwd = genomes.contig_tokens(ci)
            Lc = len(fwd)
            for strand in (1, -1):
                t = fwd.copy() if strand > 0 else alphabet.revcomp(fwd)
                for _ in range(max_hits_per_contig):
                    stats, _ = _align(q, t)
                    if (stats["score"] < max(min_hit_score, 1)
                            or stats["aln_len"] == 0):
                        break
                    ident = stats["matches"] / stats["aln_len"]
                    span = stats["qend"] - stats["qstart"] + 1
                    ts, te = stats["tstart"], stats["tend"]
                    # mask BEFORE thresholding so weaker copies surface
                    t = t.copy()
                    t[ts:te + 1] = alphabet.DNA_N
                    if ident < min_identity or span < min_frag_len:
                        # weaker hits cannot pass either — identity decays
                        if ident < min_identity:
                            break
                        continue
                    if strand > 0:
                        gs, ge = ts, te
                    else:
                        gs, ge = Lc - 1 - te, Lc - 1 - ts
                    hits.append(OracleHit(
                        exemplar=e, genome=int(genomes.contig_genome[ci]),
                        contig=ci, start=int(gs), end=int(ge),
                        strand=strand, score=int(stats["score"]),
                        identity=float(ident), qcov=span / max(L, 1)))
    return _stitch(hits)


def _stitch(hits: list, stitch_gap: int = 300) -> list:
    """Dedup/stitch: same-exemplar fragments on one contig/strand within
    stitch_gap merge (same rule as ops.genome_map.dedup_and_stitch; the
    pipeline re-applies it after concatenating protein-search hits, and
    run() mirrors that on the oracle side)."""
    hits = sorted(hits, key=lambda h: (h.exemplar, h.contig, h.strand,
                                       h.start, -h.score))
    out: list = []
    for h in hits:
        if out:
            p = out[-1]
            if (p.exemplar == h.exemplar and p.contig == h.contig
                    and p.strand == h.strand
                    and h.start <= p.end + stitch_gap):
                if h.end <= p.end:
                    continue
                if p.qcov >= 0.8 and h.qcov >= 0.8:
                    # tandem copies, not fragments: keep separate (same
                    # TANDEM_QCOV rule as ops.genome_map.dedup_and_stitch)
                    out.append(dataclasses.replace(h))
                    continue
                ln_new = h.end - max(h.start, p.end + 1) + 1
                tot = p.end - p.start + 1 + ln_new
                p.identity = (p.identity * (p.end - p.start + 1)
                              + h.identity * ln_new) / tot
                p.end = h.end
                p.score += h.score
                p.qcov = min(1.0, p.qcov + h.qcov)
                p.stitched = True
                continue
        out.append(dataclasses.replace(h))
    out.sort(key=lambda h: (h.genome, h.contig, h.start, h.exemplar))
    return out


def map_exemplars_protein(genes: GeneStore, genomes: GenomeStore,
                          exemplar_ids: np.ndarray,
                          group_of_exemplar: dict, dna_hits: list, *,
                          protein_identity: float = 0.35,
                          min_frag_aa: int = 20, gtable: int = 11,
                          match_score: int = 2,
                          max_hits_per_frame: int = 16) -> list:
    """Naive DIAMOND-vs-genome stage: 6-frame full-matrix BLOSUM62 search
    for groups the DNA hit table left missing per genome (production:
    pipeline._missing_combos + ops.protein_map.map_missing_protein).

    Per missing (genome, group): the group's representative exemplar
    (longest, then smallest id — _missing_combos' rule) aligns against
    every translate6 frame of the genome's contigs with iterative
    best-hit masking.  Fragments keep production's pass rules: AA
    identity >= protein_identity, span >= min(min_frag_aa, 8), passing
    alone at span >= min_frag_aa or via pooled union coverage of the
    (contig, strand) group (>= min_frag_aa pooled, >= 8 AA marginal).
    One deviation, documented: a fragment must share >= 1 Murphy-10
    7-mer with the query (set membership, position-free) — a strict
    SUPERSET of production's positional two-hit seeding, so it cannot
    drop a production-visible fragment, but it keeps random ~35%-identity
    full-matrix junk (which seedless search surfaces and seeded search
    never sees) out of the pooled-coverage rescue.  Coordinates map to
    forward-strand nucleotides and scores to nucleotide equivalents
    (3 * match_score * AA matches) exactly as ops.protein_map does."""
    ex_ids = [int(e) for e in exemplar_ids]
    # per-group representative: longest, then smallest gene id
    rep_of_group: dict = {}
    for e in sorted(ex_ids,
                    key=lambda e2: (-int(genes.length[e2]), e2)):
        g = group_of_exemplar.get(int(e))
        if g is not None and g >= 0:
            rep_of_group.setdefault(int(g), int(e))
    present: set = set()
    for h in dna_hits:
        g = group_of_exemplar.get(int(h.exemplar))
        if g is not None and g >= 0:
            present.add((int(h.genome), int(g)))
    hits: list = []
    for gm in range(genomes.n_genomes):
        for grp in sorted(rep_of_group):
            if (gm, grp) in present:
                continue
            e = rep_of_group[grp]
            qaa = _translate_gene(genes, e, gtable)
            Laa = len(qaa)
            if Laa == 0:
                continue
            qkmers = _murphy_kmers(qaa)
            frags = []   # (strand_grp, qs, qe, rec)
            for ci in np.flatnonzero(
                    np.asarray(genomes.contig_genome) == gm):
                toks = genomes.contig_tokens(int(ci))
                Lc = len(toks)
                for fid, faa in enumerate(alphabet.translate6(toks,
                                                              gtable)):
                    t = faa.copy()
                    for _ in range(max_hits_per_frame):
                        stats, _ = _align_aa(qaa, t)
                        if stats["score"] < 1 or stats["aln_len"] == 0:
                            break
                        ident = stats["matches"] / stats["aln_len"]
                        qs, qe = stats["qstart"], stats["qend"]
                        span = qe - qs + 1
                        ts, te = stats["tstart"], stats["tend"]
                        frag_aa = faa[ts:te + 1]
                        t = t.copy()
                        t[ts:te + 1] = alphabet.AA_X
                        if ident < protein_identity:
                            break
                        if span < min(min_frag_aa, 8):
                            continue
                        if not (_murphy_kmers(frag_aa) & qkmers):
                            continue
                        f = fid % 3
                        if fid < 3:
                            ns, ne = 3 * ts + f, 3 * te + f + 2
                            strand = 1
                        else:
                            ns = Lc - 3 - 3 * te - f
                            ne = Lc - 1 - 3 * ts - f
                            strand = -1
                        ns, ne = max(0, ns), min(Lc - 1, ne)
                        rec = OracleHit(
                            exemplar=e, genome=gm, contig=int(ci),
                            start=int(ns), end=int(ne), strand=strand,
                            score=int(3 * match_score * stats["matches"]),
                            identity=float(ident),
                            qcov=span / max(Laa, 1))
                        frags.append((int(ci), fid < 3, qs, qe, rec))
            # pass 2: own span, or pooled (contig, strand-group) coverage
            def _union(ivals):
                tot, last_end = 0, -1
                for (a, b) in sorted(ivals):
                    if a > last_end:
                        tot += b - a + 1
                        last_end = b
                    elif b > last_end:
                        tot += b - last_end
                        last_end = b
                return tot

            for (ci, sgrp, qs, qe, rec) in frags:
                if qe - qs + 1 >= min_frag_aa:
                    hits.append(rec)
                    continue
                ivals = [(a, b) for (c2, s2, a, b, _r) in frags
                         if c2 == ci and s2 == sgrp]
                others = [(a, b) for (c2, s2, a, b, r2) in frags
                          if c2 == ci and s2 == sgrp and r2 is not rec]
                pooled = _union(ivals)
                if (pooled >= min_frag_aa
                        and pooled - _union(others) >= 8):
                    hits.append(rec)
    return hits


# --- phase 7: greedy assignment (naive scans) --------------------------------

def greedy_assign(hits: list, group_of_exemplar: dict, genes: GeneStore,
                  genomes: GenomeStore, *, overlap_frac: float = 0.15,
                  pseudogene_frac: float = 0.8,
                  locus_dominance: float = 0.65,
                  synteny_gap: int = 300, synteny_diff: float = 1.2,
                  neighbor_check: bool = False, resplit_fn=None,
                  tail_frac: float = 0.9) -> Regions:
    """Documented tie-breaks, O(n^2) everywhere (no heap/bisect/bucket
    structures).  neighbor_check replicates the production synteny
    resolution (assign/greedy.py): when a group holds near-tied placements
    in one genome (best_score <= score * synteny_diff), the placement whose
    flanking claimed groups (within synteny_gap) agree with the group's
    claimed neighbourhood consensus in other genomes is claimed first.

    resplit_fn(g, live_idx) -> labels|None replicates the production
    loop's re-triggered paralog split: fires when a popped group is about
    to claim >= 2 disjoint loci in one genome, relabels with the same
    smallest-live-index-keeps-g rule, re-queues, at most once per group.
    (Scope: the oracle's partition never subsamples; production
    subsamples groups > 128 members — keep golden fixtures below that.)"""
    m = len(hits)
    grp = [int(group_of_exemplar[h.exemplar]) for h in hits]

    # locus dominance: decisively outscored overlapping other-group hits go
    def olap(a, b):
        return max(0, min(a.end, b.end) - max(a.start, b.start) + 1)

    dominated = [False] * m
    for i in range(m):
        for j in range(i + 1, m):
            a, b = hits[i], hits[j]
            if a.contig != b.contig or grp[i] == grp[j]:
                continue
            ov = olap(a, b)
            if ov <= overlap_frac * min(a.end - a.start + 1,
                                        b.end - b.start + 1):
                continue
            if a.score < locus_dominance * b.score:
                dominated[i] = True
            elif b.score < locus_dominance * a.score:
                dominated[j] = True

    live = [i for i in range(m) if not dominated[i]]
    claimed: dict = {}          # contig -> [(s, e, group)]
    taken = [False] * m

    def viable(i):
        h = hits[i]
        ln = h.end - h.start + 1
        for (cs, ce, _cg) in claimed.get(h.contig, []):
            ov = max(0, min(h.end, ce) - max(h.start, cs) + 1)
            if ov > overlap_frac * min(ln, ce - cs + 1):
                return False
        return True

    def group_score(g):
        return sum(hits[i].score for i in live
                   if grp[i] == g and not taken[i] and viable(i))

    def neighbors_of(i):
        h = hits[i]
        lo, hi = h.start - synteny_gap, h.end + synteny_gap
        return {int(cg) for (cs, ce, cg) in claimed.get(h.contig, [])
                if ce >= lo and cs <= hi}

    def _disjoint_multi_copy(per_genome):
        """Same trigger as assign.greedy: some genome holds >= 2 mutually
        non-overlapping viable placements."""
        for _gm, lst in per_genome.items():
            if len(lst) < 2:
                continue
            nonov = [lst[0]]
            for i in lst[1:]:
                h = hits[i]
                ln = h.end - h.start + 1
                ok = True
                for j in nonov:
                    hj = hits[j]
                    if h.contig != hj.contig:
                        continue
                    ov = max(0, min(h.end, hj.end)
                             - max(h.start, hj.start) + 1)
                    if ov > overlap_frac * min(ln, hj.end - hj.start + 1):
                        ok = False
                        break
                if ok:
                    nonov.append(i)
                if len(nonov) >= 2:
                    return True
        return False

    groups = sorted(set(grp[i] for i in live))
    next_label = (max(groups) + 1) if groups else 0
    resplit_tried: set = set()
    while True:
        scores = [(group_score(g), g) for g in groups]
        scores = [(s, g) for (s, g) in scores if s > 0]
        if not scores:
            break
        s, g = max(scores, key=lambda t: (t[0], -t[1]))
        groups.remove(g)
        cand = [i for i in live if grp[i] == g and not taken[i]]
        cand.sort(key=lambda i: (-hits[i].score, hits[i].genome,
                                 hits[i].contig, hits[i].start))
        per_genome: dict = {}
        for i in cand:
            if viable(i):
                per_genome.setdefault(int(hits[i].genome), []).append(i)
        if (resplit_fn is not None and g not in resplit_tried
                and _disjoint_multi_copy(per_genome)):
            # the reference loop's re-triggered paralog split (same
            # relabel rule as assign.greedy: the sublabel of the smallest
            # live hit index keeps g, the rest get fresh labels in
            # first-occurrence order; each group re-splits at most once)
            resplit_tried.add(g)
            live_g = sorted(i for i in live
                            if grp[i] == g and not taken[i])
            labels = resplit_fn(g, live_g)
            if labels is not None and len(set(map(int, labels))) > 1:
                label_of: dict = {}
                for pos, i in enumerate(live_g):
                    sub = int(labels[pos])
                    if sub not in label_of:
                        label_of[sub] = (g if not label_of
                                         else next_label
                                         + len(label_of) - 1)
                next_label += len(label_of) - 1
                for pos, i in enumerate(live_g):
                    grp[i] = label_of[int(labels[pos])]
                groups = sorted(set(groups) | set(label_of.values()))
                continue
        consensus: dict = {}
        if neighbor_check:
            for gm, lst in per_genome.items():
                for x in neighbors_of(lst[0]):
                    consensus[x] = consensus.get(x, 0) + 1
        for gm, lst in sorted(per_genome.items()):
            if neighbor_check and len(lst) > 1:
                best_sc = hits[lst[0]].score
                tied = [i for i in lst
                        if best_sc <= hits[i].score * synteny_diff]
                if len(tied) > 1:
                    tied.sort(key=lambda i: (
                        -len(neighbors_of(i) & set(consensus)),
                        -hits[i].score, hits[i].contig, hits[i].start))
                    rest = [i for i in lst if i not in tied]
                    lst = tied + rest
            for i in lst:
                if not viable(i):
                    continue
                taken[i] = True
                claimed.setdefault(hits[i].contig, []).append(
                    (hits[i].start, hits[i].end, g))

    idx = [i for i in range(m) if taken[i]]
    idx.sort(key=lambda i: (hits[i].genome, hits[i].contig, hits[i].start))

    status = np.empty(len(idx), dtype=object)
    gene_idx = np.full(len(idx), -1, np.int64)
    disrupt_pos = np.full(len(idx), -1, np.int64)
    code = alphabet.genetic_code_table(11)
    for row, i in enumerate(idx):
        h = hits[i]
        exl = int(genes.length[h.exemplar])
        ln = h.end - h.start + 1
        off = int(genomes.contig_offset[h.contig])
        seq = genomes.tokens[off + h.start:off + h.end + 1]
        if h.strand < 0:
            seq = alphabet.revcomp(seq)
        qcov_ok = h.qcov >= pseudogene_frac
        disrupted = False
        exseq = genes.gene_tokens(h.exemplar)
        # gapless certificate (same normative rule as assign.greedy /
        # disrupt.gapless_certified): full-span equal-length unstitched
        # hit whose positional score reaches the recorded optimum is
        # all-M by the diag tie-preference -> frame-0 stop scan only.
        certified = (
            qcov_ok and not h.stitched and h.qcov >= 1.0
            and len(exseq) == len(seq)
            and int(DNA[exseq.astype(np.int64),
                        seq.astype(np.int64)].sum()) == h.score)
        if qcov_ok:
            if certified:
                stats = {"qstart": 0, "tstart": 0}
                cigar = [("M", len(exseq))]
            else:
                stats, cigar = _align(exseq, seq)
            qpos, tpos = stats["qstart"], stats["tstart"]
            fs = stop = -1
            for (op, lnr) in cigar:
                if op == "M":
                    q0 = qpos + (-qpos) % 3
                    while q0 + 2 < qpos + lnr:
                        if q0 + 3 <= tail_frac * exl:
                            c = seq[tpos + (q0 - qpos):tpos + (q0 - qpos) + 3]
                            if (c < 4).all():
                                cid = (16 * int(c[0]) + 4 * int(c[1])
                                       + int(c[2]))
                                if code[cid] == alphabet.AA_STOP and stop < 0:
                                    stop = tpos + (q0 - qpos)
                        q0 += 3
                    qpos += lnr
                    tpos += lnr
                elif op == "I":
                    if lnr % 3 and fs < 0:
                        fs = tpos
                    qpos += lnr
                else:
                    if lnr % 3 and fs < 0:
                        fs = tpos
                    tpos += lnr
            disrupted = fs >= 0 or stop >= 0
            if disrupted:
                p = fs if fs >= 0 else stop
                disrupt_pos[row] = h.start + p if h.strand > 0 else h.end - p
        status[row] = "CDS" if (qcov_ok and not disrupted) else "pseudogene"
        best_ov = 0
        for gi in range(genes.n_genes):
            if int(genes.contig[gi]) != h.contig:
                continue
            gs, ge = int(genes.start[gi]) - 1, int(genes.end[gi]) - 1
            ov = max(0, min(h.end, ge) - max(h.start, gs) + 1)
            if ov > best_ov and ov >= 0.8 * max(ln, ge - gs + 1):
                best_ov = ov
                gene_idx[row] = gi
    return Regions(
        group=np.asarray([grp[i] for i in idx], np.int64),
        exemplar=np.asarray([hits[i].exemplar for i in idx], np.int32),
        genome=np.asarray([hits[i].genome for i in idx], np.int32),
        contig=np.asarray([hits[i].contig for i in idx], np.int32),
        start=np.asarray([hits[i].start for i in idx], np.int64),
        end=np.asarray([hits[i].end for i in idx], np.int64),
        strand=np.asarray([hits[i].strand for i in idx], np.int8),
        score=np.asarray([hits[i].score for i in idx], np.int32),
        identity=np.asarray([hits[i].identity for i in idx], np.float32),
        status=status,
        gene_idx=gene_idx,
        disrupt_pos=disrupt_pos,
    )


# --- end-to-end --------------------------------------------------------------

def run(genome_store: GenomeStore, gene_store: GeneStore, *,
        clust_identity: float = 0.9, clust_match_prop: float = 0.9,
        match_identity: float = 0.65, match_prop: float = 0.5,
        match_len: int = 0, match_frag_len: int = 50,
        stitch_gap: int = 300, pseudogene_frac: float = 0.8,
        paralog_split: bool = False, allowed_sigma: float = 3.0,
        neighbor_check: bool = False, synteny_gap: int = 300,
        synteny_diff: float = 1.2, nucl_only: bool = True,
        protein_identity: float = 0.35, min_frag_aa: int = 20,
        gtable: int = 11, min_hit_score: int = 26) -> dict:
    """Phases 3-7 end to end; returns the decision set for diffing.

    nucl_only=False (round 4) adds the protein path on both rails the
    production pipeline has it: all-pairs AA edges in the similarity
    phase, and the naive 6-frame translated search + cross-method
    stitch for missing (genome, group) combos before assignment.

    min_hit_score: map_exemplars' masking-loop floor.  The default 26 is
    exact for SEEDED production mapping (see map_exemplars docstring);
    diffs against --exhaustive_fallback runs must pass 1, because the
    windowed sweep can surface hits with no exact 13-mer run
    (tests/golden/test_vs_host_oracle_exhaustive.py)."""
    root, exemplar, exemplar_ids = cluster(
        gene_store, identity=clust_identity, coverage=clust_match_prop)
    group_root = similarity_groups(
        gene_store, exemplar, exemplar_ids,
        match_identity=match_identity, match_prop=match_prop,
        match_len=match_len,
        protein_identity=None if nucl_only else protein_identity,
        gtable=gtable)
    if paralog_split:
        expect, sigma = estimate_divergence(
            gene_store, group_root, genome_store.n_genomes)
        group_root = split_groups(gene_store, group_root, expect, sigma,
                                  allowed_sigma=allowed_sigma)
    hits = map_exemplars(gene_store, genome_store, exemplar_ids,
                         min_identity=match_identity,
                         min_frag_len=match_frag_len,
                         stitch_gap=stitch_gap,
                         min_hit_score=min_hit_score)
    group_of_exemplar = {int(e): int(group_root[int(e)])
                         for e in exemplar_ids}
    if not nucl_only:
        phits = map_exemplars_protein(
            gene_store, genome_store, exemplar_ids, group_of_exemplar,
            hits, protein_identity=protein_identity,
            min_frag_aa=min_frag_aa, gtable=gtable)
        if phits:
            hits = _stitch(hits + phits, stitch_gap)
    resplit_fn = None
    if paralog_split:
        # the assignment loop's re-triggered split measures divergence on
        # the POST-split labels (pipeline.py does the same): partition the
        # claimed locus SEQUENCES with full-matrix DP distances +
        # interpreter-loop NJ + the normative edge test
        expect2, sigma2 = estimate_divergence(
            gene_store, group_root, genome_store.n_genomes)

        def resplit_fn(_g, live_idx):
            if len(live_idx) <= 2:
                return None
            seqs, gens = [], []
            for i in live_idx:
                h = hits[i]
                off = int(genome_store.contig_offset[h.contig])
                seq = genome_store.tokens[off + h.start:off + h.end + 1]
                if h.strand < 0:
                    seq = alphabet.revcomp(seq)
                seqs.append(seq)
                gens.append(h.genome)
            dm = _pair_distance_matrix(seqs)
            comp = _tree_components(dm, np.asarray(gens), expect2, sigma2,
                                    allowed_sigma)
            lab: dict = {}
            return np.asarray([lab.setdefault(c, len(lab)) for c in comp],
                              np.int64)

    regions = greedy_assign(hits, group_of_exemplar, gene_store,
                            genome_store, pseudogene_frac=pseudogene_frac,
                            neighbor_check=neighbor_check,
                            synteny_gap=synteny_gap,
                            synteny_diff=synteny_diff,
                            resplit_fn=resplit_fn)
    return {"root": root, "exemplar": exemplar,
            "exemplar_ids": exemplar_ids, "group_root": group_root,
            "hits": hits, "regions": regions}
