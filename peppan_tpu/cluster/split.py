"""Tree-aware paralog splitting — PEPPA.py::filt_per_group equivalent.

PEPPAN phase 6 (reference mount empty at build time; semantics per
SURVEY.md §2.1 "Gene-tree paralog splitter" and §3.1): similarity clusters
that actually contain paralogs — detectable because some genome contributes
two or more members — are split by building a per-group NJ gene tree and
cutting branches whose inter-clade divergence exceeds the genome-wide
expectation ("global_difference" test, tolerance ``--allowed_sigma``).

TPU-native re-expression:
  - member pairwise distances = 1 - identity from the banded-SW stats pass
    (device, batched over all member pairs of all flagged groups at once);
  - gene trees from cluster.nj.nj_batched (device, vmapped);
  - the divergence test and the actual cutting are tiny host-side loops
    over parent-pointer arrays (the ete3 replacement).

Divergence expectation: for each genome pair (a, b), the median member
distance over single-copy groups shared by a and b; the spread sigma is the
global MAD of those medians.  An internal edge is cut when the mean
cross-clade distance exceeds expectation + allowed_sigma * sigma.
(Exact reference formula TO-VERIFY once the mount is populated.)
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..io.tokens import GeneStore
from ..ops import pairs as prs
from . import nj


@dataclasses.dataclass
class DivergenceModel:
    expect: np.ndarray   # float32[G, G] expected inter-genome distance
    sigma: float         # global spread

    def expected(self, ga: np.ndarray, gb: np.ndarray) -> np.ndarray:
        return self.expect[ga, gb]


def _group_members(group_of_gene: np.ndarray) -> dict:
    members: dict = {}
    for g, grp in enumerate(group_of_gene):
        if grp >= 0:
            members.setdefault(int(grp), []).append(g)
    return members


def estimate_divergence(store: GeneStore, group_of_gene: np.ndarray,
                        hits: prs.PairHits, n_genomes: int, *,
                        band: int = 128,
                        batch: int = 4096, mesh=None) -> DivergenceModel:
    """Expected inter-genome gene distance from single-copy groups.

    Uses already-verified pair hits (phase 4 edges): for every hit whose two
    genes are in the same single-copy group and different genomes, record
    1 - identity for that genome pair; expectation = per-pair median.

    Two-pass interplay: cluster-phase hits may carry prefilter SENTINEL
    stats (ops.pairs.prefiltered_rows) for pairs the score certificate
    decided below the cluster threshold.  This model consumes identity
    VALUES of sub-threshold pairs, so any sentinel row this function
    would use is re-verified exactly here first — the model is
    bit-identical to the one computed from a single-pass run (the
    re-verification uses the same band/width-bucket geometry; the few
    same-group sentinel rows are a tiny alignment batch).
    """
    # fully vectorized: at 500 genomes the cluster-hit table has ~1M rows
    labels = np.asarray(group_of_gene)
    n_groups = int(labels.max()) + 1 if len(labels) else 0
    # single-copy groups: no (group, genome) cell holds 2+ members
    gg_key = labels * np.int64(n_genomes) + store.genome
    valid_g = labels >= 0
    _uk, cnts = np.unique(gg_key[valid_g], return_counts=True)
    dup_groups = np.zeros(n_groups + 1, dtype=bool)
    np.logical_or.at(dup_groups, (_uk // n_genomes).astype(np.int64),
                     cnts >= 2)
    a = hits.pairs[:, 0].astype(np.int64)
    b = hits.pairs[:, 1].astype(np.int64)
    ga, gb = store.genome[a], store.genome[b]
    base = ((labels[a] == labels[b]) & (labels[a] >= 0)
            & ~dup_groups[np.clip(labels[a], 0, n_groups)]
            & (ga != gb))
    identity, aln_len = hits.identity, hits.aln_len
    pre = base & prs.prefiltered_rows(hits)
    if pre.any():
        h2 = prs.verify_pairs(store, hits.pairs[pre], band=band,
                              batch=batch, mesh=mesh)
        identity = identity.copy()
        aln_len = aln_len.copy()
        identity[pre] = h2.identity
        aln_len[pre] = h2.aln_len
    mask = base & (aln_len > 0)
    d = (1.0 - identity[mask]).astype(np.float64)
    pk = (np.minimum(ga, gb)[mask] * np.int64(n_genomes)
          + np.maximum(ga, gb)[mask])
    expect = np.zeros((n_genomes, n_genomes), np.float32)
    observed = np.zeros((n_genomes, n_genomes), bool)
    meds = np.zeros(0)
    residuals = np.zeros(0)
    if len(d):
        order = np.lexsort((d, pk))
        pk_s, d_s = pk[order], d[order]
        starts = np.flatnonzero(np.r_[True, pk_s[1:] != pk_s[:-1]])
        counts = np.diff(np.r_[starts, len(pk_s)])
        meds = d_s[starts + (counts - 1) // 2]   # per-pair median (sorted)
        gi = (pk_s[starts] // n_genomes).astype(np.int64)
        gj = (pk_s[starts] % n_genomes).astype(np.int64)
        expect[gi, gj] = meds
        expect[gj, gi] = meds
        observed[gi, gj] = observed[gj, gi] = True
        residuals = d_s - np.repeat(meds, counts)
    # Fallback for genome pairs with NO single-copy shared groups
    # (normative semantics pending mount verification, SURVEY §2.1
    # global_difference): use the more diverged genome's MARGINAL median
    # — max(row_median[a], row_median[b]) — so one highly diverged genome
    # keeps its elevated expectation instead of inheriting the global
    # median of the close majority; genomes with no observations at all
    # fall back to the global median.
    overall = float(np.median(meds)) if len(meds) else 0.05
    np.fill_diagonal(observed, True)     # diagonal is 0 by definition
    row_obs = observed & ~np.eye(n_genomes, dtype=bool)
    row_med = np.array([
        float(np.median(expect[g][row_obs[g]])) if row_obs[g].any()
        else overall
        for g in range(n_genomes)], np.float32)
    miss = ~observed
    if miss.any():
        fill = np.maximum(row_med[:, None], row_med[None, :])
        expect[miss] = fill[miss]
    np.fill_diagonal(expect, 0.0)
    # sigma = robust spread of individual gene distances around their genome
    # pair's expectation (how much single-gene divergence naturally wobbles)
    if len(residuals):
        sigma = max(float(np.median(np.abs(residuals))) * 1.4826, 0.01)
    else:
        sigma = 0.02
    return DivergenceModel(expect=expect, sigma=sigma)


def _cut_components(n: int, cl: np.ndarray, cr: np.ndarray, root: int,
                    parent_arr: np.ndarray, dm: np.ndarray,
                    genomes: np.ndarray, div: DivergenceModel,
                    allowed_sigma: float) -> np.ndarray:
    """Divergence-test every edge of one NJ tree; return int64[n] component
    label (a leaf index) per leaf after cutting the failing edges.

    Rooting-free edge test: every tree edge induces a leaf bipartition
    (A = clade below, B = rest).  The edge is a duplication boundary iff
    even the CLOSEST cross pair is more diverged than the genome
    expectation allows (min is robust to substructure on either side; a
    mean would be inflated by distant sub-clades, and a low quantile of
    all cross cells over-cuts: for the edge just inside clade B of an
    already-true A|B duplication, the bipartition {A + few of B} vs
    {rest of B} holds mostly far A-B cells, so a 10% quantile lands on
    the far side and severs a non-duplication edge — measured on the
    20-genome golden fixture as 8 spurious subgroups).  NJ's arbitrary
    root placement cannot affect bipartitions of the unrooted tree.

    Leaf sets come from one bottom-up boolean-mask sweep (NJ emits
    children before parents, so ascending slot order is topological);
    the per-edge set/sort/leaves_under python walk this replaces was the
    paralog_split phase's host hotspot at 100+ genomes.
    """
    M = 2 * n - 1
    masks = np.zeros((M, n), dtype=bool)
    masks[np.arange(n), np.arange(n)] = True
    for x in range(n, M):
        if cl[x] >= 0:
            masks[x] = masks[int(cl[x])] | masks[int(cr[x])]
    E = div.expect[np.ix_(genomes, genomes)]     # float32[n, n]

    def edge_cut(amask):
        bmask = ~amask
        if not amask.any() or not bmask.any():
            return False
        cross = dm[np.ix_(amask, bmask)]
        stat = float(cross.min())
        exp = float(np.mean(E[np.ix_(amask, bmask)]))
        return stat > exp + allowed_sigma * div.sigma

    uf_parent = list(range(2 * n - 1))

    def find(a):
        while uf_parent[a] != a:
            uf_parent[a] = uf_parent[uf_parent[a]]
            a = uf_parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            uf_parent[max(ra, rb)] = min(ra, rb)

    # the root's two child edges are one unrooted edge: test once
    if not edge_cut(masks[int(cl[root])]):
        union(int(cl[root]), root)
        union(int(cr[root]), root)
    for x in range(2 * n - 2):         # every non-root node's up-edge
        if parent_arr[x] < 0 or parent_arr[x] == root:
            continue
        if not edge_cut(masks[x]):
            union(x, int(parent_arr[x]))
    return np.array([find(lf) for lf in range(n)], np.int64)


def partition_sequences(seqs: list, genomes: np.ndarray,
                        div: DivergenceModel, *, allowed_sigma: float = 3.0,
                        band: int = 128, batch: int = 1024,
                        max_members: int = 128, mesh=None) -> np.ndarray:
    """NJ + divergence-cut partition of arbitrary token sequences.

    This is the re-triggered filt_per_group of the reference's assignment
    loop (SURVEY.md §3.3: the greedy loop re-invokes the paralog splitter
    when a group's surviving placements look paralogous).  Unlike
    split_groups it operates on MAPPED LOCUS sequences, so unannotated
    copies and pseudogene loci participate in the tree.

    Returns int64[len(seqs)] subgroup labels, dense 0..k-1 ordered by
    first occurrence (label 0 contains seqs[0]'s component ... etc.),
    or all-zeros when no edge fails the divergence test.
    """
    n = len(seqs)
    genomes = np.asarray(genomes)
    if n <= 2:
        return np.zeros(n, np.int64)
    # deterministic stride subsample for oversized hit sets; unsampled
    # members join the subgroup of their best-matching representative
    if n > max_members:
        stride = int(np.ceil(n / max_members))
        sampled = list(range(0, n, stride))[:max_members]
    else:
        sampled = list(range(n))
    unsampled = [i for i in range(n) if i not in set(sampled)]
    store = GeneStore.from_sequences([seqs[i] for i in sampled],
                                     genome=genomes[sampled])
    ns = len(sampled)
    iu, ju = np.triu_indices(ns, 1)
    pair_arr = np.stack([iu, ju], axis=1).astype(np.int32)
    hits = prs.verify_pairs(store, pair_arr, band=band, batch=batch,
                            mesh=mesh)
    dm = np.zeros((ns, ns), np.float32)
    dv = np.where(hits.aln_len > 0,
                  np.float32(1.0) - hits.identity.astype(np.float32),
                  np.float32(1.0)).astype(np.float32)
    dm[iu, ju] = dv
    dm[ju, iu] = dv
    # pad the NJ width to a power-of-two grid: n_max is a static jit arg
    # and shape churn = recompiles (CLAUDE.md backend note)
    n_pad = 4
    while n_pad < ns:
        n_pad *= 2
    dmp = np.zeros((n_pad, n_pad), np.float32)
    dmp[:ns, :ns] = dm
    trees = nj.nj_batched(jnp.asarray(dmp[None]),
                          jnp.asarray([ns], np.int32), n_max=n_pad)
    comp = _cut_components(
        ns, np.asarray(trees["child_l"][0]), np.asarray(trees["child_r"][0]),
        int(trees["root"][0]), np.asarray(trees["parent"][0]), dm,
        store.genome, div, allowed_sigma)
    # dense labels by first occurrence over the SAMPLED order
    label_of_comp: dict = {}
    out = np.zeros(n, np.int64)
    for si, i in enumerate(sampled):
        c = int(comp[si])
        if c not in label_of_comp:
            label_of_comp[c] = len(label_of_comp)
        out[i] = label_of_comp[c]
    if unsampled and len(label_of_comp) > 1:
        # representative per subgroup: longest sampled member, then first
        reps = {}
        for c, lbl in label_of_comp.items():
            members = [sampled[si] for si in range(ns) if comp[si] == c]
            reps[lbl] = max(members, key=lambda i: (len(seqs[i]), -i))
        rep_items = sorted(reps.items())
        all_seqs = GeneStore.from_sequences(
            [seqs[i] for i in range(n)], genome=genomes)
        pair2 = np.asarray([(u, rep) for u in unsampled
                            for _lbl, rep in rep_items], np.int32)
        h2 = prs.verify_pairs(all_seqs, pair2, band=band, batch=batch,
                              mesh=mesh)
        ident = h2.identity.reshape(len(unsampled), len(rep_items))
        best = np.argmax(ident, axis=1)
        for ui, u in enumerate(unsampled):
            out[u] = rep_items[int(best[ui])][0]
    return out


def split_groups(store: GeneStore, group_of_gene: np.ndarray,
                 div: DivergenceModel, *, allowed_sigma: float = 3.0,
                 max_members: int = 128, band: int = 128,
                 batch: int = 1024, mesh=None) -> np.ndarray:
    """Split paralog-containing groups; returns new group labels.

    New labels are allocated past the current max so untouched groups keep
    their ids; subgroup labels are deterministic (ordered by smallest member
    gene index).
    """
    members = _group_members(group_of_gene)
    flagged = []          # (group, sampled members, unsampled members)
    for grp, mem in sorted(members.items()):
        gen = store.genome[mem]
        if len(np.unique(gen)) >= len(gen) or len(mem) <= 2:
            continue
        if len(mem) <= max_members:
            flagged.append((grp, mem, []))
            continue
        # oversized group (every group at hundreds of genomes): run the
        # tree on a deterministic subsample — every member of a duplicated
        # genome (the paralog signal) plus an even stride of the rest —
        # then assign unsampled members to the best-matching subgroup by
        # alignment against subgroup representatives
        gcount: dict = {}
        for g in gen:
            gcount[int(g)] = gcount.get(int(g), 0) + 1
        dup = [m for m in mem if gcount[int(store.genome[m])] > 1]
        rest = [m for m in mem if gcount[int(store.genome[m])] == 1]
        if len(dup) > max_members:   # even the paralog signal oversubscribes
            # order by within-genome copy rank FIRST so a stride keeps every
            # copy class represented (genome-major order would keep only
            # first copies and hide the paralogs from the tree)
            seen: dict = {}
            ranked = []
            for m2 in dup:
                g2 = int(store.genome[m2])
                seen[g2] = seen.get(g2, 0) + 1
                ranked.append((seen[g2], g2, m2))
            ranked.sort()
            dup = [m2 for (_r, _g, m2) in ranked]
            dstride = int(np.ceil(len(dup) / max_members))
            dup = dup[::dstride][:max_members]
        room = max(max_members - len(dup), 0)
        stride = max(1, int(np.ceil(len(rest) / max(room, 1))))
        sampled = sorted(dup + rest[::stride][:room])
        unsampled = sorted(set(mem) - set(sampled))
        if 2 < len(sampled) <= max_members:
            flagged.append((grp, sampled, unsampled))
    if not flagged:
        return group_of_gene.copy()

    # one big batched SW pass over every member pair of every flagged group
    pair_rows = []
    for grp, mem, _uns in flagged:
        n = len(mem)
        for i in range(n):
            for j in range(i + 1, n):
                pair_rows.append((mem[i], mem[j]))
    import time as _time

    from ..utils import metrics
    _t = _time.perf_counter()
    pair_arr = np.asarray(pair_rows, np.int32)
    hits = prs.verify_pairs(store, pair_arr, band=band, batch=batch,
                            mesh=mesh)
    metrics.add("split_t_verify", _time.perf_counter() - _t)
    _t = _time.perf_counter()
    # unaligned pairs -> maximal distance (vectorized; pair_rows are
    # group-major in upper-triangle order, so each group's slice maps
    # straight onto triu_indices — the dict-keyed double loop this
    # replaces was ~n_max^2 python iterations per flagged group)
    dvals = np.where(hits.aln_len > 0,
                     np.float32(1.0) - hits.identity.astype(np.float32),
                     np.float32(1.0)).astype(np.float32)

    # batched NJ over flagged groups (single n_max bucket)
    n_max = max(len(mem) for _, mem, _uns in flagged)
    G = len(flagged)
    dms = np.zeros((G, n_max, n_max), np.float32)
    ns = np.zeros(G, np.int32)
    ofs = 0
    for gi, (grp, mem, _uns) in enumerate(flagged):
        n = len(mem)
        ns[gi] = n
        m = n * (n - 1) // 2
        iu, ju = np.triu_indices(n, 1)
        dms[gi, iu, ju] = dvals[ofs:ofs + m]
        dms[gi, ju, iu] = dvals[ofs:ofs + m]
        ofs += m
    trees = {k: np.asarray(v) for k, v in nj.nj_batched(
        jnp.asarray(dms), jnp.asarray(ns), n_max=n_max).items()}
    metrics.add("split_t_nj", _time.perf_counter() - _t)
    _t = _time.perf_counter()

    out = group_of_gene.copy()
    next_label = int(group_of_gene.max()) + 1
    # unsampled-member rep assignment batches across ALL splitting groups
    # into one verify_pairs call (a per-group call paid a device launch
    # round-trip per split); labels are assigned before verification so
    # batching cannot change them
    pending = []     # (unsampled, rep_list, label_of_comp)
    pair2_rows = []
    for gi, (grp, mem, unsampled) in enumerate(flagged):
        n = int(ns[gi])
        comp = _cut_components(
            n, np.asarray(trees["child_l"][gi]),
            np.asarray(trees["child_r"][gi]), int(trees["root"][gi]),
            np.asarray(trees["parent"][gi]), dms[gi, :n, :n],
            store.genome[mem], div, allowed_sigma)
        # only actually split if >1 component materialized
        if len(np.unique(comp)) <= 1:
            continue
        # deterministic relabel: component containing the smallest gene id
        # keeps the original label; others get fresh labels in order
        order = {}
        for leaf in np.argsort(np.asarray(mem)):
            c = comp[leaf]
            if c not in order:
                order[c] = len(order)
        label_of_comp = {c: (grp if o == 0 else next_label + o - 1)
                         for c, o in order.items()}
        for leaf, gidx in enumerate(mem):
            out[gidx] = label_of_comp[comp[leaf]]
        next_label += len(order) - 1

        if unsampled:
            # assign each unsampled member to the subgroup whose
            # representative (longest sampled member) it matches best
            reps = {}
            for c in np.unique(comp):
                cand = [mem[l] for l in np.flatnonzero(comp == c)]
                reps[int(c)] = max(cand, key=lambda m2: (
                    int(store.length[m2]), -m2))
            rep_list = sorted(reps.items())
            pending.append((unsampled, rep_list, label_of_comp))
            pair2_rows.extend((u, rep) for u in unsampled
                              for _c, rep in rep_list)
    if pending:
        h2 = prs.verify_pairs(store, np.asarray(pair2_rows, np.int32),
                              band=band, batch=batch, mesh=mesh)
        ofs2 = 0
        for (unsampled, rep_list, label_of_comp) in pending:
            m2 = len(unsampled) * len(rep_list)
            ident = h2.identity[ofs2:ofs2 + m2].reshape(
                len(unsampled), len(rep_list))
            best = np.argmax(ident, axis=1)
            for ui, u in enumerate(unsampled):
                out[u] = label_of_comp[rep_list[int(best[ui])][0]]
            ofs2 += m2
    metrics.add("split_t_cut", _time.perf_counter() - _t)
    return out
