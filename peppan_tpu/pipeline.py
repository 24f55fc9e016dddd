"""Phase-sequenced pan-genome pipeline (PEPPA.py::main equivalent).

Phase layout mirrors the reference call stack (SURVEY.md §3.1; reference
mount empty at build time):
  1. readGFF            -> io.gff.load_genomes (host parse -> token arrays)
  2. gene pool          -> folded into phase 1 (GeneStore is the pool)
  3. getClust           -> cluster.linclust.cluster_genes (device SW verify)
  4. get_similar_pairs  -> exemplar self-similarity graph (device SW)
  5. iter_map_bsn       -> genome mapping (matrix engine; later milestone)
  6. filt_per_group     -> tree-aware paralog splitting (cluster.split)
  7. filt_genes         -> greedy ortholog assignment (assign.greedy)
  8. write_output       -> io.writers

All phases are implemented; expensive ones cache under --continue
(utils.manifest), counters land in <prefix>.phases.jsonl, and setting
mesh_data/mesh_db in the config runs the verification paths data-parallel
over a ('data','db') device mesh.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time

import numpy as np

from .assign import greedy
from .cluster import linclust, split
from .cluster.unionfind import connected_components
from .config import PipelineConfig
from .io import alphabet, gff, writers
from .io.tokens import GeneStore, GenomeStore
from .ops import genome_map, pairs as prs, protein, protein_map
from .utils import manifest, metrics

log = logging.getLogger("peppan_tpu")


@dataclasses.dataclass
class PipelineResult:
    genome_store: GenomeStore
    gene_store: GeneStore
    clusters: linclust.ClusterResult
    group_of_gene: np.ndarray     # int64[n_genes], -1 = unassigned
    group_names: list
    outputs: dict                 # name -> path
    phase_seconds: dict
    map_hits: object = None       # ops.genome_map.MapHits
    regions: object = None        # assign.greedy.Regions


def _similarity_groups(store: GeneStore, clusters: linclust.ClusterResult,
                       cfg: PipelineConfig, mesh=None,
                       launch_cache=None) -> np.ndarray:
    """Phase 4: connect exemplars whose alignment passes the match
    thresholds; returns component root per gene (via its exemplar)."""
    ex_ids = clusters.exemplar_ids
    sub = store.subset(ex_ids)
    if cfg.candidate_source == "profile":
        # MXU k-mer-profile matmul tiles (pod-scale candidate discovery)
        from .ops import profile_prefilter
        cand = profile_prefilter.profile_candidates(
            sub, np.arange(sub.n_genes), mesh=mesh)
    else:
        table = prs.build_minimizer_table(sub, k=cfg.kmer, w=cfg.window)
        cand, _, _ = prs.candidate_pairs(table,
                                         max_group=cfg.max_minimizer_group)
    # two-sided score certificate (round 4): at match_identity ~0.65 the
    # FAIL side can't prune (coef < 0) but the PASS side certifies the
    # high-identity mass (gapless pairs above ~0.8 identity) straight
    # from pass-1 scores — only the twilight band pays the stats DP.
    # Decision-exact: keep below tests identity/coverage at EXACTLY the
    # certificate's thresholds (see ops.pairs.Prefilter docstring).
    pf = (prs.Prefilter(min_identity=cfg.match_identity,
                        min_qcov=cfg.match_prop, min_tcov=cfg.match_prop,
                        cov_mode="max", match_len=cfg.match_len)
          if cfg.score_prefilter and not cfg.shard_store else None)
    hits = prs.verify_pairs(sub, cand, band=cfg.band, batch=cfg.sw_batch,
                            gap_open=cfg.gap_open, gap_extend=cfg.gap_extend,
                            mesh=mesh, shard_store=cfg.shard_store,
                            launch_cache=launch_cache, launch_tag="sim",
                            prefilter=pf)
    # an edge passes on aligned PROPORTION, or (--match_len) on absolute
    # aligned length — the long-gene escape hatch (SURVEY §5.6)
    cov_ok = np.maximum(hits.qcov, hits.tcov) >= cfg.match_prop
    if cfg.match_len > 0:
        cov_ok |= hits.aln_len >= cfg.match_len
    keep = (hits.identity >= cfg.match_identity) & cov_ok
    # map subset indices back to gene ids
    edges = ex_ids[hits.pairs[keep]]
    if not cfg.nucl_only:
        # DIAMOND-equivalent protein pass: homologs whose DNA identity has
        # decayed below match_identity but whose proteins still align
        aa_edges = protein.protein_similar_pairs(
            store, ex_ids, gtable=cfg.gtable,
            min_identity=cfg.protein_identity, min_cov=cfg.match_prop,
            max_group=cfg.max_minimizer_group, batch=cfg.sw_batch)
        if len(aa_edges):
            edges = np.concatenate([edges, aa_edges])
    comp = connected_components(store.n_genes, edges)
    return comp[clusters.exemplar]


def _missing_combos(store: GeneStore, clusters: linclust.ClusterResult,
                    group_of_gene: np.ndarray, map_hits,
                    n_genomes: int) -> dict:
    """{genome: [representative exemplar per group absent there]}.

    Fully vectorized — the python dict-loop version was O(hits)
    interpreter work per run (round-1 review finding)."""
    labels = np.asarray(group_of_gene)
    ex_ids = np.asarray(clusters.exemplar_ids, np.int64)
    grp_ex = labels[ex_ids]
    valid = grp_ex >= 0
    ex_ids, grp_ex = ex_ids[valid], grp_ex[valid]
    if len(ex_ids) == 0:
        return {}
    uniq_groups, ginv = np.unique(grp_ex, return_inverse=True)
    G = len(uniq_groups)
    # representative exemplar per group: longest, then smallest gene id
    order = np.lexsort((ex_ids, -store.length[ex_ids].astype(np.int64)))
    rank = np.empty(len(order), np.int64)
    rank[order] = np.arange(len(order))
    best_rank = np.full(G, len(order), np.int64)
    np.minimum.at(best_rank, ginv, rank)
    rep = np.zeros(G, np.int64)
    sel = rank == best_rank[ginv]
    rep[ginv[sel]] = ex_ids[sel]
    # (genome, group) presence matrix from the map hits
    hit_grp = labels[np.asarray(map_hits.exemplar, np.int64)]
    pos = np.searchsorted(uniq_groups, hit_grp)
    ok = ((hit_grp >= 0) & (pos < G)
          & (uniq_groups[np.clip(pos, 0, G - 1)] == hit_grp))
    present = np.zeros((n_genomes, G), bool)
    present[np.asarray(map_hits.genome)[ok], pos[ok]] = True
    missing: dict = {}
    for gm in range(n_genomes):
        absent = np.flatnonzero(~present[gm])
        if len(absent):
            missing[gm] = [int(rep[a]) for a in absent]
    return missing


def _dense_groups(group_root: np.ndarray, gene_names: list) -> tuple:
    """Root labels -> dense group indices + names (root gene's name)."""
    roots = np.unique(group_root)
    root_to_group = {int(r): i for i, r in enumerate(roots)}
    group_of_gene = np.array([root_to_group[int(r)] for r in group_root],
                             dtype=np.int64)
    group_names = [gene_names[int(r)] for r in roots]
    return group_of_gene, group_names


def run(paths: list, cfg: PipelineConfig = PipelineConfig(),
        out_dir: str = ".") -> PipelineResult:
    from .utils import jaxinit
    jaxinit.setup_cache()
    if cfg.profile_dir:
        import contextlib
        import jax
        profile_cm = jax.profiler.trace(cfg.profile_dir)
    else:
        import contextlib
        profile_cm = contextlib.nullcontext()
    with profile_cm:
        return _run_inner(paths, cfg, out_dir)


def _run_inner(paths: list, cfg: PipelineConfig,
               out_dir: str) -> PipelineResult:
    phase_seconds: dict = {}

    mesh = None
    if cfg.mesh_data * cfg.mesh_db > 1:
        from .parallel import mesh as meshmod
        mesh = meshmod.make_mesh(data=cfg.mesh_data, db=cfg.mesh_db)
        log.info("mesh: %s", dict(mesh.shape))
        if cfg.shard_store:
            # pod-memory mode; per-device HBM for the store is logged by
            # the hbm_store_bytes_per_device counter (phases.jsonl)
            log.info("shard_store: token store rows shard over db=%d",
                     cfg.mesh_db)

    os.makedirs(out_dir, exist_ok=True)
    phase_log = metrics.PhaseLog(
        os.path.join(out_dir, cfg.prefix + ".phases.jsonl"))

    def tick(name, t0):
        phase_seconds[name] = time.time() - t0
        entry = phase_log.record(name, phase_seconds[name])
        log.info("phase %-14s %6.2fs %s", name, phase_seconds[name],
                 {k: v for k, v in entry.items()
                  if k not in ("phase", "seconds", "ts")})

    t0 = time.time()
    genome_store, gene_store = gff.load_genomes(
        paths, min_cds=cfg.min_cds, incomplete_cds=cfg.incomplete_cds,
        gtable=cfg.gtable)
    # --genes: curated reference gene FASTAs join the pool as
    # pseudo-genomes past the real ones (no contigs; see
    # GeneStore.with_external) and outrank every annotation below
    for fi, gpath in enumerate(cfg.genes):
        fa = gff.read_fasta(gpath)
        gene_store = gene_store.with_external(
            list(fa.values()), list(fa.keys()),
            genome_store.n_genomes + fi)
    n_total_genomes = genome_store.n_genomes + len(cfg.genes)
    tick("read_gff", t0)
    log.info("genomes=%d contigs=%d genes=%d%s", genome_store.n_genomes,
             genome_store.n_contigs, gene_store.n_genes,
             f" (+{len(cfg.genes)} external files)" if cfg.genes else "")

    cache = manifest.PhaseCache(
        os.path.join(out_dir, cfg.prefix + ".phase_cache"),
        list(paths) + list(cfg.genes),
        repr(cfg), cfg.continue_run)

    t0 = time.time()
    ent = cache.load("cluster")
    if ent is not None:
        clusters = linclust.ClusterResult(
            root=ent["root"], exemplar=ent["exemplar"],
            exemplar_ids=ent["exemplar_ids"],
            hits=prs.PairHits(*(ent[f"h_{f}"] for f in
                                ("pairs", "score", "identity", "qcov",
                                 "tcov", "matches", "aln_len"))))
        log.info("cluster: resumed from cache")
    else:
        # --priority: genomes listed earlier outrank the rest (ties by
        # input order within the same rank); --untrusted genomes rank
        # LAST; --genes pseudo-genomes rank FIRST (rank -1)
        prio = np.full(n_total_genomes, len(cfg.priority), np.int64)
        prio[genome_store.n_genomes:] = -1
        for rank, pname in enumerate(cfg.priority):
            for gi, gname in enumerate(genome_store.genome_names):
                if gname == pname and prio[gi] == len(cfg.priority):
                    prio[gi] = rank
        unset = set(cfg.untrusted)
        for gi, gname in enumerate(genome_store.genome_names):
            if gname in unset and prio[gi] == len(cfg.priority):
                prio[gi] = len(cfg.priority) + 1
        clu_launch_cache = manifest.LaunchCache(
            os.path.join(out_dir, cfg.prefix + ".launch_ckpt_cluster"),
            key="cluster:" + cache.base_hash, enabled=cfg.continue_run)
        clusters = linclust.cluster_genes(
            gene_store, identity=cfg.clust_identity,
            coverage=cfg.clust_match_prop, k=cfg.kmer, w=cfg.window,
            band=cfg.band, max_group=cfg.max_minimizer_group,
            batch=cfg.sw_batch, mesh=mesh,
            genome_priority=prio if (len(cfg.priority) or len(cfg.genes)
                                     or len(cfg.untrusted)) else None,
            launch_cache=clu_launch_cache if cfg.continue_run else None,
            score_prefilter=cfg.score_prefilter)
        clu_launch_cache.clear()
        cache.store("cluster", {
            "root": clusters.root, "exemplar": clusters.exemplar,
            "exemplar_ids": clusters.exemplar_ids,
            **{f"h_{f.name}": getattr(clusters.hits, f.name)
               for f in dataclasses.fields(prs.PairHits)}})
    tick("cluster", t0)
    log.info("clusters=%d", clusters.n_clusters)

    t0 = time.time()
    ent = cache.load("similar_pairs")
    if ent is not None:
        group_root = ent["group_root"]
    else:
        sim_launch_cache = manifest.LaunchCache(
            os.path.join(out_dir, cfg.prefix + ".launch_ckpt_similar"),
            key="similar:" + cache.base_hash, enabled=cfg.continue_run)
        group_root = _similarity_groups(
            gene_store, clusters, cfg, mesh,
            launch_cache=sim_launch_cache if cfg.continue_run else None)
        sim_launch_cache.clear()
        cache.store("similar_pairs", {"group_root": group_root})
    group_of_gene, group_names = _dense_groups(group_root, gene_store.names)
    tick("similar_pairs", t0)
    log.info("groups=%d", len(group_names))

    t0 = time.time()
    ent = cache.load("genome_map")
    if ent is not None:
        map_hits = genome_map.MapHits(
            *(ent[f.name] for f in dataclasses.fields(genome_map.MapHits)))
    else:
        # exemplar minimizer table first: its hash set feeds the genome
        # index's membership prefilter (device drops non-joining
        # minimizers before the expensive fetch) and is reused for the
        # mapping join itself
        ex_table = prs.build_minimizer_table(
            gene_store.subset(np.asarray(clusters.exemplar_ids)),
            k=cfg.kmer, w=cfg.window, batch=cfg.sw_batch)
        gindex = genome_map.index_genomes(
            genome_store, k=cfg.kmer, w=cfg.window,
            query_hashes=np.unique(ex_table.hash))
        # launch-granular resume inside the longest phase: a tunnel
        # stall/crash resumes at the failed launch, not the phase start
        launch_cache = manifest.LaunchCache(
            os.path.join(out_dir, cfg.prefix + ".launch_ckpt"),
            key="genome_map:" + cache.base_hash,
            enabled=cfg.continue_run)
        map_hits = genome_map.map_exemplars(
            gene_store, genome_store, clusters.exemplar_ids, gindex,
            table=ex_table,
            min_identity=cfg.match_identity, min_frag_len=cfg.match_frag_len,
            min_frag_prop=cfg.match_frag_prop,
            band=cfg.band, batch=cfg.sw_batch, gap_open=cfg.gap_open,
            gap_extend=cfg.gap_extend, stitch_gap=cfg.synteny_gap,
            xdrop_floor=cfg.xdrop_floor,
            launch_cache=launch_cache if cfg.continue_run else None,
            mesh=mesh)
        if not cfg.nucl_only:
            # DIAMOND-vs-genome stage: protein-search each genome for the
            # groups that nucleotide mapping left missing there (divergent
            # or disrupted copies; SURVEY §2.2 / §3.2)
            _tm = time.time()
            missing = _missing_combos(gene_store, clusters, group_of_gene,
                                      map_hits, genome_store.n_genomes)
            metrics.add("map_t_missing", time.time() - _tm)
            if missing:
                phits = protein_map.map_missing_protein(
                    gene_store, genome_store, clusters.exemplar_ids,
                    missing, gtable=cfg.gtable,
                    min_identity=cfg.protein_identity, batch=cfg.sw_batch,
                    xdrop_floor=cfg.aa_xdrop_floor, mesh=mesh)
                if len(phits):
                    log.info("protein_map recovered %d hits", len(phits))
                    map_hits = genome_map.MapHits.concat([map_hits, phits])
                    # stitch frame-split protein fragments (and mixed
                    # DNA+protein fragments) of one exemplar into single
                    # disrupted regions — the frameshift-aware DIAMOND /
                    # uberBlast cross-method HSP merge (SURVEY §2.2, §3.2)
                    map_hits = genome_map.dedup_and_stitch(
                        map_hits, gene_store, cfg.synteny_gap)
        if cfg.exhaustive_fallback:
            # blastn-grade sweep for combos STILL missing after the
            # seeded DNA + protein passes (zero candidates anywhere)
            missing = _missing_combos(gene_store, clusters, group_of_gene,
                                      map_hits, genome_store.n_genomes)
            if missing:
                shits = genome_map.exhaustive_missing(
                    gene_store, genome_store, missing, mesh=mesh,
                    band=cfg.band, min_identity=cfg.match_identity,
                    min_frag_len=cfg.match_frag_len,
                    min_frag_prop=cfg.match_frag_prop,
                    gap_open=cfg.gap_open, gap_extend=cfg.gap_extend,
                    batch=cfg.sw_batch)
                if len(shits):
                    log.info("exhaustive sweep recovered %d hits",
                             len(shits))
                    map_hits = genome_map.dedup_and_stitch(
                        genome_map.MapHits.concat([map_hits, shits]),
                        gene_store, cfg.synteny_gap)
        cache.store("genome_map", {
            f.name: getattr(map_hits, f.name)
            for f in dataclasses.fields(genome_map.MapHits)})
        launch_cache.clear()       # phase committed; per-launch files are
        #                            redundant now
    tick("genome_map", t0)
    log.info("map_hits=%d", len(map_hits))

    if cfg.paralog_split:
        t0 = time.time()
        ent = cache.load("paralog_split")
        if ent is not None:
            new_groups = ent["labels"]
        else:
            div = split.estimate_divergence(gene_store, group_of_gene,
                                            clusters.hits, n_total_genomes,
                                            band=cfg.band,
                                            batch=cfg.sw_batch, mesh=mesh)
            new_groups = split.split_groups(
                gene_store, group_of_gene, div,
                allowed_sigma=cfg.allowed_sigma, band=cfg.band,
                batch=cfg.sw_batch, mesh=mesh)
            cache.store("paralog_split", {"labels": new_groups})
        # name fresh subgroup labels after their smallest member gene
        n_old = len(group_names)
        for lbl in np.unique(new_groups):
            if lbl >= n_old:
                first = int(np.flatnonzero(new_groups == lbl).min())
                while len(group_names) <= lbl:
                    group_names.append(None)
                group_names[int(lbl)] = gene_store.names[first] + "_p"
        group_of_gene = new_groups
        tick("paralog_split", t0)
        log.info("groups_after_split=%d", len(np.unique(group_of_gene)))

    # phase 7: greedy region assignment over the genome-map hits
    t0 = time.time()
    group_of_exemplar = {int(e): int(group_of_gene[int(e)])
                         for e in clusters.exemplar_ids}

    # reference loop's re-triggered split (SURVEY §3.3): when the greedy
    # loop sees a group about to claim >=2 disjoint loci in one genome, the
    # loci sequences themselves get the NJ + divergence test (this catches
    # merged families whose second copy is unannotated, which the
    # gene-level phase-6 split cannot see)
    resplit_fn = None
    if cfg.paralog_split:
        div_model = split.estimate_divergence(
            gene_store, group_of_gene, clusters.hits, n_total_genomes,
            band=cfg.band, batch=cfg.sw_batch, mesh=mesh)

        def resplit_fn(_gid, hit_idx, _mh=map_hits):
            seqs = []
            for i in map(int, hit_idx):
                off = int(genome_store.contig_offset[int(_mh.contig[i])])
                seq = genome_store.tokens[off + int(_mh.start[i]):
                                          off + int(_mh.end[i]) + 1]
                if _mh.strand[i] < 0:
                    seq = alphabet.revcomp(seq)
                seqs.append(seq)
            return split.partition_sequences(
                seqs, _mh.genome[np.asarray(hit_idx, np.int64)], div_model,
                allowed_sigma=cfg.allowed_sigma, band=cfg.band,
                batch=cfg.sw_batch, mesh=mesh)

    regions = greedy.greedy_assign(
        map_hits, group_of_exemplar, gene_store, genome_store,
        pseudogene_frac=cfg.pseudogene_frac, synteny_gap=cfg.synteny_gap,
        synteny_diff=cfg.synteny_diff, neighbor_check=cfg.neighbor_check,
        resplit_fn=resplit_fn)
    # labels minted by the re-split get deterministic names: the first
    # region's exemplar gene name + "_r"
    order_r = np.argsort(regions.group, kind="stable")
    for i in map(int, order_r):
        lbl = int(regions.group[i])
        while len(group_names) <= lbl:
            group_names.append(None)
        if group_names[lbl] is None:
            group_names[lbl] = (
                gene_store.names[int(regions.exemplar[i])] + "_r")
    # unify: a gene matched by a region adopts the region's group
    # (vectorized; on duplicate gene_idx the last row wins, matching the
    # ascending python loop it replaces)
    adopted = np.asarray(regions.gene_idx) >= 0
    group_of_gene[regions.gene_idx[adopted]] = regions.group[adopted]
    # labels minted by the re-split that ended up claiming nothing still
    # need names (writers sort the name list)
    for lbl in range(len(group_names)):
        if group_names[lbl] is None:
            members = np.flatnonzero(group_of_gene == lbl)
            group_names[lbl] = (
                gene_store.names[int(members.min())] + "_r"
                if len(members) else f"GROUP_{lbl}_r")
    tick("assign", t0)
    log.info("regions=%d (pseudo=%d)", len(regions),
             int((regions.status == "pseudogene").sum()))

    t0 = time.time()
    os.makedirs(out_dir, exist_ok=True)
    pre = os.path.join(out_dir, cfg.prefix)
    outputs = {
        "gff": pre + ".PEPPAN.gff",
        "alleles": pre + ".allele.fna",
        "rtab": pre + ".gene_content.Rtab",
        "csv": pre + ".gene_content.csv",
        "clust": pre + ".clust.tab",
        "genes": pre + ".genes.fna",
        "exemplars": pre + ".exemplar.fna",
    }
    writers.write_region_gff(outputs["gff"], genome_store, regions,
                             group_names, gene_store.names)
    # reference-parity intermediates: pooled gene FASTA + exemplar FASTA
    writers.write_gene_fasta(outputs["genes"], gene_store)
    writers.write_gene_fasta(outputs["exemplars"], gene_store,
                             clusters.exemplar_ids)
    writers.write_clusters(outputs["clust"], gene_store, clusters.exemplar,
                           group_of_gene, group_names)
    writers.write_alleles(outputs["alleles"], gene_store, group_of_gene,
                          group_names)
    mat = writers.region_presence_matrix(regions, len(group_names),
                                         genome_store.n_genomes)
    writers.write_gene_content(outputs["rtab"], outputs["csv"], mat,
                               group_names, genome_store.genome_names)
    if cfg.save_hits:
        outputs["map"] = pre + ".map.tsv"
        writers.write_map_hits(
            outputs["map"], map_hits, gene_store,
            genome_store.genome_names, genome_store.contig_names,
            search_space=float(genome_store.contig_offset[-1]))
    tick("write_output", t0)
    return PipelineResult(genome_store, gene_store, clusters, group_of_gene,
                          group_names, outputs, phase_seconds,
                          map_hits=map_hits, regions=regions)
