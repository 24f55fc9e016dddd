"""Phase-5 genome mapping and phase-7 assignment unit tests."""

import numpy as np
import pytest

from peppan_tpu.assign import greedy
from peppan_tpu.io import alphabet as ab, gff
from peppan_tpu.ops import genome_map
from peppan_tpu.utils import simulate


@pytest.fixture(scope="module")
def mapped(tmp_path_factory):
    sim = simulate.simulate(n_genomes=3, n_core=8, n_accessory=0,
                            mean_gene_codons=150, divergence=0.02, seed=21)
    out = tmp_path_factory.mktemp("map_sim")
    paths = simulate.write_gff(sim, str(out))
    genomes, genes = gff.load_genomes(paths)
    index = genome_map.index_genomes(genomes)
    # map every gene of genome 0 (exemplar stand-ins) onto everything
    ex = np.flatnonzero(genes.genome == 0).astype(np.int64)
    hits = genome_map.map_exemplars(genes, genomes, ex, index)
    return sim, genomes, genes, ex, hits


def test_every_gene_found_in_every_genome(mapped):
    sim, genomes, genes, ex, hits = mapped
    # each exemplar (core family) should hit all 3 genomes
    for e in ex:
        got = set(hits.genome[hits.exemplar == e].tolist())
        assert got == {0, 1, 2}, genes.names[e]


def test_self_hit_exact(mapped):
    sim, genomes, genes, ex, hits = mapped
    for e in ex:
        sel = (hits.exemplar == e) & (hits.genome == 0)
        assert sel.sum() == 1
        i = int(np.flatnonzero(sel)[0])
        # coordinates must match the annotation (GFF 1-based -> 0-based)
        assert int(hits.start[i]) == int(genes.start[e]) - 1
        assert int(hits.end[i]) == int(genes.end[e]) - 1
        assert int(hits.strand[i]) == int(genes.strand[e])
        assert hits.identity[i] == 1.0
        assert hits.qcov[i] == 1.0


def test_minus_strand_coordinates(mapped):
    sim, genomes, genes, ex, hits = mapped
    minus = [e for e in ex if genes.strand[e] < 0]
    assert minus, "fixture should contain minus-strand genes"
    e = minus[0]
    sel = (hits.exemplar == e) & (hits.genome == 0)
    i = int(np.flatnonzero(sel)[0])
    # the genome subsequence, revcomp'd, must equal the gene
    ci = int(hits.contig[i])
    s, t = int(hits.start[i]), int(hits.end[i])
    seg = genomes.contig_tokens(ci)[s:t + 1]
    assert np.array_equal(ab.revcomp(seg), genes.gene_tokens(int(e)))


def test_truncated_copy_called_pseudogene(tmp_path):
    rng = np.random.default_rng(5)
    sim = simulate.simulate(n_genomes=2, n_core=6, n_accessory=0,
                            mean_gene_codons=200, divergence=0.01, seed=33)
    # truncate one gene in genome 1: chop its 3' half out of the contig
    gname = sim.genome_names[1]
    cname, s, e, st, gid = sim.features[1][2]
    contig = sim.contigs[1][cname]
    cut_from = s - 1 + (e - s + 1) // 2
    sim.contigs[1][cname] = np.concatenate([contig[:cut_from],
                                            contig[e:]])
    # remove the feature (it is now broken) and shift downstream features
    removed = e - cut_from
    sim.features[1] = [
        (c, ss if ss <= cut_from else ss - removed,
         ee if ee <= cut_from else ee - removed, stt, g)
        for (c, ss, ee, stt, g) in sim.features[1] if g != gid]
    paths = simulate.write_gff(sim, str(tmp_path))
    genomes, genes = gff.load_genomes(paths)
    index = genome_map.index_genomes(genomes)
    ex = np.flatnonzero(genes.genome == 0).astype(np.int64)
    hits = genome_map.map_exemplars(genes, genomes, ex, index)
    group_of_ex = {int(e2): int(k) for k, e2 in enumerate(ex)}
    regions = greedy.greedy_assign(hits, group_of_ex, genes, genomes)
    # find the truncated family's region in genome 1
    fam = sim.truth[gid]
    ex_of_fam = [int(e2) for e2 in ex if sim.truth[genes.names[e2]] == fam]
    assert ex_of_fam
    sel = np.flatnonzero(
        (regions.exemplar == ex_of_fam[0]) & (regions.genome == 1))
    assert len(sel) >= 1
    assert all(regions.status[i] == "pseudogene" for i in sel)
    # intact copies elsewhere stay CDS
    sel0 = np.flatnonzero(
        (regions.exemplar == ex_of_fam[0]) & (regions.genome == 0))
    assert all(regions.status[i] == "CDS" for i in sel0)


def _mk_hits(rows):
    """rows: (exemplar, contig, start, end, score, qcov)."""
    m = len(rows)
    return genome_map.MapHits(
        exemplar=np.array([r[0] for r in rows], np.int32),
        genome=np.zeros(m, np.int32),
        contig=np.array([r[1] for r in rows], np.int32),
        start=np.array([r[2] for r in rows], np.int64),
        end=np.array([r[3] for r in rows], np.int64),
        strand=np.ones(m, np.int8),
        score=np.array([r[4] for r in rows], np.int32),
        identity=np.full(m, 0.9, np.float32),
        qcov=np.array([r[5] for r in rows], np.float32),
        stitched=np.zeros(m, bool),
    )


def test_stitch_merges_fragments_not_tandem_copies():
    # two half-coverage fragments within stitch_gap -> one stitched region
    frags = genome_map.dedup_and_stitch(
        _mk_hits([(7, 0, 100, 400, 300, 0.5), (7, 0, 550, 850, 300, 0.5)]),
        None, stitch_gap=300)
    assert len(frags) == 1 and bool(frags.stitched[0])
    assert (int(frags.start[0]), int(frags.end[0])) == (100, 850)
    # two FULL-length copies the same distance apart are tandem paralogs
    # and must stay separate (copy counting), not merge into one region
    tand = genome_map.dedup_and_stitch(
        _mk_hits([(7, 0, 100, 400, 300, 1.0), (7, 0, 550, 850, 300, 1.0)]),
        None, stitch_gap=300)
    assert len(tand) == 2
    assert not tand.stitched.any()
    # a contained duplicate of a full copy still dedups
    dup = genome_map.dedup_and_stitch(
        _mk_hits([(7, 0, 100, 400, 300, 1.0), (7, 0, 120, 380, 250, 0.9)]),
        None, stitch_gap=300)
    assert len(dup) == 1


def test_nonsense_mutation_called_pseudogene(tmp_path):
    """Same-length internal-stop copy (nonsense mutation) -> pseudogene."""
    import numpy as np
    from peppan_tpu.io import alphabet as ab

    sim = simulate.simulate(n_genomes=2, n_core=6, n_accessory=0,
                            mean_gene_codons=200, divergence=0.01, seed=77)
    (cname, s, e, st, gid) = sim.features[1][1]
    contig = sim.contigs[1][cname]
    g = contig[s - 1:e].copy()
    if st < 0:
        g = ab.revcomp(g)
    # plant TAA stops mid-gene (codon-aligned, length preserved)
    mid = (len(g) // 6) * 3
    for off in (mid, mid + 30):
        g[off:off + 3] = ab.encode_dna("TAA")
    placed = g if st > 0 else ab.revcomp(g)
    contig[s - 1:e] = placed

    paths = simulate.write_gff(sim, str(tmp_path / "gff"))
    genomes, genes = gff.load_genomes(paths, incomplete_cds=True)
    index = genome_map.index_genomes(genomes)
    ex = np.flatnonzero(genes.genome == 0).astype(np.int64)
    hits = genome_map.map_exemplars(genes, genomes, ex, index)
    group_of_ex = {int(e2): int(k) for k, e2 in enumerate(ex)}
    regions = greedy.greedy_assign(hits, group_of_ex, genes, genomes)
    fam = sim.truth[gid]
    ex_fam = [int(e2) for e2 in ex if sim.truth[genes.names[e2]] == fam]
    sel = np.flatnonzero((regions.exemplar == ex_fam[0])
                         & (regions.genome == 1))
    assert len(sel) == 1
    assert regions.status[int(sel[0])] == "pseudogene"
    # the intact copy in genome 0 stays CDS
    sel0 = np.flatnonzero((regions.exemplar == ex_fam[0])
                          & (regions.genome == 0))
    assert regions.status[int(sel0[0])] == "CDS"


def test_ungapped_best_matches_naive():
    """Vectorized Kadane vs an explicit python max-subarray."""
    rng = np.random.default_rng(9)
    rows = [rng.integers(-3, 3, size=int(n)).astype(np.int32)
            for n in rng.integers(1, 200, size=50)]
    got = genome_map._ungapped_best(rows)
    for r, g in zip(rows, got):
        best, cur = -10**9, 0
        for v in map(int, r):
            cur = max(v, cur + v)
            best = max(best, cur)
        assert int(g) == best


def test_xdrop_floor_keeps_every_real_hit(mapped):
    """The default ungapped pre-extension floor (34) must not change the
    hit table on a clean fixture — real anchors score far above it
    (blastn parity stage, SURVEY §2.2; round-2 verdict item 2)."""
    sim, genomes, genes, ex, hits = mapped
    index = genome_map.index_genomes(genomes)
    hits34 = genome_map.map_exemplars(genes, genomes, ex, index,
                                      xdrop_floor=34)
    import dataclasses as dc
    for f in dc.fields(genome_map.MapHits):
        assert np.array_equal(getattr(hits, f.name),
                              getattr(hits34, f.name)), f.name


def test_xdrop_floor_drops_bare_seed_noise(tmp_path):
    """Two planted 16-bp exact islands on one diagonal pass two-hit
    chaining but their best ungapped segment (<= 32) sits below the
    floor: the candidate must skip the banded DP entirely (counter), and
    the final hit table must be unchanged vs floor=0 (the DP would have
    rejected it on identity anyway — the floor only saves the work)."""
    from peppan_tpu.utils import metrics

    from peppan_tpu.io.tokens import GeneStore
    from peppan_tpu.ops import pairs as prs

    rng = np.random.default_rng(123)
    sim = simulate.simulate(n_genomes=2, n_core=5, n_accessory=0,
                            mean_gene_codons=150, divergence=0.01, seed=3)
    (cname, s, e, st, gid) = sim.features[0][0]
    contig0 = sim.contigs[0][cname]
    gene = contig0[s - 1:e]
    if st < 0:
        gene = ab.revcomp(gene)
    # islands are planted AT the gene's own minimizer positions so the
    # hash join deterministically seeds them; >= 90 bp of random spacer
    # between islands keeps the joint ungapped segment deeply negative
    tbl = prs.build_minimizer_table(
        GeneStore.from_sequences([gene], genome=np.zeros(1, np.int64)),
        k=13, w=8)
    picks, last = [], -1000
    for p in sorted(tbl.pos.tolist()):
        if p - last >= 90 and p + 16 <= len(gene):
            picks.append(int(p))
            last = int(p)
    assert len(picks) >= 2
    parts, qprev = [rng.integers(0, 4, 400).astype(np.int8)], None
    for p in picks:
        if qprev is not None:
            gap = rng.integers(0, 4, p - qprev - 16).astype(np.int8)
            # guaranteed mismatches right at the island borders: the
            # segment score is EXACTLY 2 * 16 = 32 < 34
            gap[0] = (int(gene[qprev + 16]) + 1) % 4
            gap[-1] = (int(gene[p - 1]) + 1) % 4
            parts.append(gap)
        parts.append(gene[p:p + 16])
        qprev = p
    tail = rng.integers(0, 4, 400).astype(np.int8)
    tail[0] = (int(gene[qprev + 16]) + 1) % 4
    parts[0][-1] = (int(gene[picks[0] - 1]) + 1) % 4 if picks[0] else 0
    parts.append(tail)
    junk = np.concatenate(parts)
    c2name = list(sim.contigs[1])[0]
    sim.contigs[1][c2name] = np.concatenate([sim.contigs[1][c2name], junk])
    paths = simulate.write_gff(sim, str(tmp_path / "gff"))
    genomes, genes = gff.load_genomes(paths)
    index = genome_map.index_genomes(genomes)
    ex = np.flatnonzero(genes.genome == 0).astype(np.int64)

    metrics.reset()
    h0 = genome_map.map_exemplars(genes, genomes, ex, index, xdrop_floor=0)
    w0 = metrics.snapshot().get("map_windows", 0)
    metrics.reset()
    h1 = genome_map.map_exemplars(genes, genomes, ex, index, xdrop_floor=34)
    snap = metrics.snapshot()
    assert snap.get("map_xdrop_dropped", 0) >= 1
    assert snap.get("map_windows", 0) < w0
    assert snap.get("map_xdrop_min_kept", 0) > 34
    import dataclasses as dc
    for f in dc.fields(genome_map.MapHits):
        assert np.array_equal(getattr(h0, f.name),
                              getattr(h1, f.name)), f.name


def test_ungapped_best_segmented_matches_list_kadane(rng):
    """Segmented Kadane (round-4 X-drop vectorization) vs the padded
    list-of-rows Kadane: bit-equal on adversarial segments (all-negative
    rows, single elements, long alternating runs, segment boundaries
    where the global cumsum dips below earlier segments)."""
    from peppan_tpu.ops.genome_map import (_ungapped_best,
                                           _ungapped_best_segmented)

    rows = []
    for _ in range(200):
        n = int(rng.integers(1, 50))
        r = rng.choice([-100, -3, 2, 2, 2], n).astype(np.int32)
        rows.append(r)
    rows.append(np.full(1, -100, np.int32))
    rows.append(np.full(300, -3, np.int32))
    rows.append(np.full(300, 2, np.int32))
    want = _ungapped_best(rows)
    lens = np.asarray([len(r) for r in rows])
    seg0 = np.cumsum(lens) - lens
    got = _ungapped_best_segmented(np.concatenate(rows), seg0)
    assert np.array_equal(want, got)


def test_xdrop_default_is_lossless_on_seed_flanked_indel(tmp_path):
    """A true copy whose exact 13-mer seed is IMMEDIATELY flanked by an
    indel has an ungapped anchor near the bare-seed 26: the round-3
    default floor (34) could silently drop it; the round-4 exact default
    (26) must keep it.  Engineered: copy = 14 matching bp + 1-bp
    insertion + diverged-but-matching remainder."""
    rng = np.random.default_rng(9)
    sim = simulate.simulate(n_genomes=2, n_core=5, n_accessory=0,
                            mean_gene_codons=120, divergence=0.01, seed=11)
    (cname, s, e, st, gid) = sim.features[0][0]
    gene = sim.contigs[0][cname][s - 1:e]
    if st < 0:
        gene = ab.revcomp(gene)
    # mutate every ~6th base beyond the seed head so no LONG ungapped
    # run survives on the ANCHOR diagonal (identity stays ~0.83), but
    # leave one exact 24-bp run at [200, 224) so the chain passes the
    # two-hit rule — that run sits on the POST-indel diagonal, so the
    # anchor-diagonal ungapped segment is just the 14-bp head (~28)
    copy = gene.copy()
    for p in range(20, len(copy), 6):
        if not 200 <= p < 224:
            copy[p] = (int(copy[p]) + 1) % 4
    copy = np.concatenate([copy[:14],
                           rng.integers(0, 4, 1).astype(np.int8),
                           copy[14:]])
    c2 = list(sim.contigs[1])[0]
    sim.contigs[1][c2] = np.concatenate(
        [sim.contigs[1][c2], rng.integers(0, 4, 61).astype(np.int8), copy])
    paths = simulate.write_gff(sim, str(tmp_path / "gff"))
    genomes, genes = gff.load_genomes(paths)
    index = genome_map.index_genomes(genomes)
    ex = np.asarray([int(np.flatnonzero(
        [n == gid for n in genes.names])[0])], np.int64)
    base = int(genomes.contig_offset[genomes.n_contigs - 1])
    locus_start = len(sim.contigs[1][c2]) - len(copy)

    hits = genome_map.map_exemplars(genes, genomes, ex, index,
                                    xdrop_floor=26)
    found = [(int(hits.start[i]), int(hits.end[i]))
             for i in range(len(hits))
             if int(hits.genome[i]) == 1
             and int(hits.start[i]) >= locus_start - 70]
    assert found, "exact floor 26 dropped a qualifying seed-flanked hit"


def test_xdrop_probe_insurance_recovers_and_shouts(tmp_path):
    """With a deliberately lossy floor, the deterministic probe sample
    must keep some real hits in the pipeline and raise the loud
    map_xdrop_recovered counter (round-4 runtime insurance)."""
    from peppan_tpu.utils import metrics

    sim = simulate.simulate(n_genomes=4, n_core=12, n_accessory=0,
                            mean_gene_codons=120, divergence=0.03, seed=21)
    paths = simulate.write_gff(sim, str(tmp_path / "gff"))
    genomes, genes = gff.load_genomes(paths)
    index = genome_map.index_genomes(genomes)
    ex = np.flatnonzero(genes.genome == 0).astype(np.int64)
    metrics.reset()
    hits = genome_map.map_exemplars(genes, genomes, ex, index,
                                    xdrop_floor=10 ** 6)
    snap = metrics.snapshot()
    assert snap.get("map_xdrop_probes", 0) >= 1
    assert snap.get("map_xdrop_recovered", 0) >= 1
    assert len(hits) >= 1        # the probes' hits stay in the table


def test_launch_rows_sharded_and_fallback():
    import functools

    from peppan_tpu.ops import genome_map, sw
    from peppan_tpu.parallel import mesh as meshmod
    from peppan_tpu.utils import metrics

    mesh = meshmod.make_mesh(data=4, db=2)
    rng = np.random.default_rng(3)
    q = rng.integers(0, 4, (16, 64)).astype(np.int8)
    t = sw.prep_target_tokens(rng.integers(0, 4, (16, 96)).astype(np.int8))
    fn = functools.partial(sw.sw_banded_packed, scorer=sw.dna_scorer(),
                           band=32)
    # shard_map over all 8 devices, bit-identical stats to unsharded
    a = np.asarray(genome_map.launch_rows_sharded(mesh, fn, q, t))
    b = np.asarray(fn(q, t))
    assert np.array_equal(a, b)
    # rows not divisible by the flattened device count: unsharded
    # fallback with a visible counter, NOT an exception (review finding:
    # 256-row floor vs >256-device pods)
    metrics.reset()
    c = np.asarray(genome_map.launch_rows_sharded(mesh, fn, q[:4], t[:4]))
    assert np.array_equal(c, np.asarray(fn(q[:4], t[:4])))
    assert metrics.snapshot().get("launch_shard_fallback", 0) == 1
    # mesh=None passthrough
    d = np.asarray(genome_map.launch_rows_sharded(None, fn, q[:4], t[:4]))
    assert np.array_equal(d, c)
