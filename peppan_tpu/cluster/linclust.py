"""Gene deduplication / clustering — the MMseqs2-linclust replacement.

PEPPAN phase 3 (reference: PEPPA.py::getClust driving `mmseqs linclust` at
``--clust_identity`` ~0.9 and ``--clust_match_prop``; mount empty at build
time, semantics per SURVEY.md §2.1/§2.2): pool all genes, cluster at high
identity, and pick one exemplar per cluster; exemplars are what the
all-vs-all self-comparison and per-genome mapping phases operate on.

TPU-native pipeline (SURVEY.md §7.1.5):
  minimizer sketch (device) -> shared-minimizer candidate edges (host join)
  -> banded-SW verification (device, exact identity/coverage) -> union-find
  -> deterministic exemplar choice (longest member, then smallest index).

Unlike linclust's greedy centroid assignment, membership here is decided by
verified alignment against the cluster graph's connected components; the
identity/coverage thresholds carry the same meaning as PEPPAN's flags.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..io.tokens import GeneStore
from ..ops import pairs as prs
from .unionfind import connected_components


@dataclasses.dataclass
class ClusterResult:
    root: np.ndarray          # int64[n_genes] cluster root (smallest index)
    exemplar: np.ndarray      # int64[n_genes] exemplar gene of each gene's cluster
    exemplar_ids: np.ndarray  # int64[n_clusters] sorted unique exemplars
    hits: prs.PairHits        # the verified edges (for reuse/inspection)

    @property
    def n_clusters(self) -> int:
        return len(self.exemplar_ids)


def exact_duplicate_groups(store: GeneStore) -> np.ndarray:
    """int64[n]: for each gene, the smallest gene index with byte-identical
    sequence.  PEPPAN dedups identical pooled genes before clustering
    (PEPPA.py::addGenes per SURVEY.md §2.1) — at thousands of genomes most
    core genes collapse here, shrinking every downstream phase."""
    n = store.n_genes
    first_of: dict = {}
    rep = np.empty(n, dtype=np.int64)
    for g in range(n):
        key = store.gene_tokens(g).tobytes()
        rep[g] = first_of.setdefault(key, g)
    return rep


def cluster_genes(store: GeneStore, *, identity: float = 0.9,
                  coverage: float = 0.9, k: int = 13, w: int = 8,
                  band: int = 128, max_group: int = 64,
                  batch: int = 4096, m_per_gene: int = 20,
                  genome_priority: np.ndarray | None = None,
                  mesh=None, shard_store: bool = False,
                  launch_cache=None,
                  score_prefilter: bool = True) -> ClusterResult:
    """Cluster pooled genes at high identity; choose exemplars.

    identity / coverage mirror PEPPAN's --clust_identity / --clust_match_prop
    (defaults per SURVEY.md §5.6; exact reference defaults TO-VERIFY once the
    mount is populated).  Coverage is required of BOTH sequences, matching
    mmseqs cov-mode 0.

    genome_priority: optional int rank per genome (lower = more trusted,
    PEPPAN's --priority); exemplars prefer trusted annotations, then
    length, then smallest index.
    """
    import time as _time

    from ..utils import metrics
    _t = _time.perf_counter()
    n = store.n_genes
    # stage 0: collapse byte-identical sequences; only representatives go
    # through sketch + alignment, duplicates inherit their cluster
    dup_rep = exact_duplicate_groups(store)
    uniq_ids = np.flatnonzero(dup_rep == np.arange(n))
    sub = store.subset(uniq_ids)
    metrics.add("clu_t_dedup", _time.perf_counter() - _t)
    _t = _time.perf_counter()

    # linclust-style reductions: (a) only the m lowest-hash minimizers per
    # gene seed the join (mmseqs linclust's per-sequence m-kmer subset) —
    # selected ON DEVICE inside the sketch launches (round 4; the round-3
    # host path fetched every minimizer and lexsorted 68M rows at L4);
    # (b) each gene pairs only with its minimizer group's CENTER (longest
    # member) — transitivity comes from union-find, no all-pairs needed
    table = prs.build_minimizer_table(sub, k=k, w=w, batch=batch,
                                      m_per_gene=m_per_gene)
    cand = prs.candidate_center_pairs(table, sub.length)
    metrics.add("clu_t_seed", _time.perf_counter() - _t)
    _t = _time.perf_counter()
    # two-pass verification (SURVEY §7.3.3 applied to pair verification):
    # at clust_identity ~0.9 the score certificate is strong, so most
    # spurious shared-minimizer candidates are decided FAIL by the fast
    # score-only pass and never pay the stats DP.  Exactness-preserving:
    # the cluster keep-filter below decides identically, and
    # estimate_divergence re-verifies any sentinel rows it consumes.
    # FAIL-side only: these hits feed estimate_divergence, which consumes
    # identity VALUES and re-verifies sentinels — PASS sentinels here
    # would re-pay the skipped stats DP in the split phase (round 4)
    pf = (prs.Prefilter(min_identity=identity, min_qcov=coverage,
                        min_tcov=coverage, two_sided=False)
          if score_prefilter and not shard_store else None)
    hits = prs.verify_pairs(sub, cand, band=band, batch=batch, mesh=mesh,
                            shard_store=shard_store,
                            launch_cache=launch_cache, launch_tag="clu",
                            prefilter=pf)
    metrics.add("clu_t_verify", _time.perf_counter() - _t)
    keep = ((hits.identity >= identity) & (hits.qcov >= coverage)
            & (hits.tcov >= coverage))
    # lift subset edges back to global ids, plus duplicate edges
    edges_u = uniq_ids[hits.pairs[keep]]
    dup_edges = np.stack([np.arange(n), dup_rep], axis=1)
    edges = np.concatenate([edges_u, dup_edges[dup_edges[:, 0]
                                               != dup_edges[:, 1]]])
    root = connected_components(n, edges)

    # exemplar per cluster: (annotation priority, longest, smallest index)
    if genome_priority is not None:
        prio = np.asarray(genome_priority)[store.genome]
    else:
        prio = np.zeros(n, dtype=np.int64)
    order = np.lexsort((np.arange(n), -store.length.astype(np.int64), prio))
    exemplar_of_root: dict = {}
    for g in order:
        r = root[g]
        if r not in exemplar_of_root:
            exemplar_of_root[r] = int(g)
    exemplar = np.array([exemplar_of_root[r] for r in root], dtype=np.int64)
    exemplar_ids = np.unique(exemplar)
    # hits carry subset-local pair ids; translate to global for consumers
    hits = prs.PairHits(
        pairs=uniq_ids[hits.pairs].astype(np.int32), score=hits.score,
        identity=hits.identity, qcov=hits.qcov, tcov=hits.tcov,
        matches=hits.matches, aln_len=hits.aln_len)
    return ClusterResult(root=root, exemplar=exemplar,
                         exemplar_ids=exemplar_ids, hits=hits)
