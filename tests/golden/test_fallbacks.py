"""End-to-end coverage for the opt-in search components (VERDICT r1 item
7): the exhaustive windowed-sweep fallback (parallel.seqtile via
ops.genome_map.exhaustive_missing) and the MXU k-mer-profile candidate
source (ops.profile_prefilter)."""

import numpy as np
import pytest

from peppan_tpu import pipeline
from peppan_tpu.config import PipelineConfig

_STOPS = {"TAA", "TAG", "TGA"}
_BASES = "ACGT"


def _cds(rng, n_codons):
    """A valid CDS: ATG + random non-stop codons + TAA."""
    out = ["ATG"]
    while len(out) < n_codons - 1:
        c = "".join(rng.choice(list(_BASES), 3))
        if c not in _STOPS:
            out.append(c)
    out.append("TAA")
    return "".join(out)


def _mutate_every(seq, step, phase=5):
    """Point-mutate every `step`-th base: longest conserved run is
    step-1 (< k=13), so NO minimizer seed can survive, while identity
    stays ~1 - 1/step (>> the 0.65 floor)."""
    s = list(seq)
    for i in range(phase, len(s), step):
        s[i] = _BASES[(_BASES.index(s[i]) + 1) % 4]
    return "".join(s)


def _revcomp(seq):
    return seq.translate(str.maketrans("ACGT", "TGCA"))[::-1]


def _write(path, contig, seq, features):
    with open(path, "w") as fh:
        fh.write("##gff-version 3\n")
        fh.write(f"##sequence-region {contig} 1 {len(seq)}\n")
        for (s, e, strand, gid) in features:
            fh.write(f"{contig}\tt\tCDS\t{s}\t{e}\t.\t{strand}\t0\t"
                     f"ID={gid};locus_tag={gid}\n")
        fh.write("##FASTA\n")
        fh.write(f">{contig}\n{seq}\n")


@pytest.fixture(scope="module")
def unseeded_case(tmp_path_factory):
    """Genome A annotates geneX; genome B carries an UNANNOTATED mutated
    copy (every 10th base substituted -> zero shared 13-mers, ~90%%
    identity) plus its own annotated geneY.  Returns (paths, coords)."""
    rng = np.random.default_rng(404)
    gene_x = _cds(rng, 100)            # 300 bp
    gene_y = _cds(rng, 100)
    bg = lambda n: "".join(rng.choice(list(_BASES), n))  # noqa: E731

    d = tmp_path_factory.mktemp("unseeded")
    seq_a = bg(500) + gene_x + bg(500)
    _write(str(d / "A.gff"), "ctgA", seq_a,
           [(501, 500 + len(gene_x), "+", "geneX")])

    mut = _mutate_every(gene_x, 10)
    fwd_start = 400 + len(gene_y) + 300          # 0-based insert offset
    seq_b = (bg(400) + gene_y + bg(300) + mut + bg(300)
             + _revcomp(mut) + bg(200))
    rc_start = fwd_start + len(mut) + 300
    _write(str(d / "B.gff"), "ctgB", seq_b,
           [(401, 400 + len(gene_y), "+", "geneY")])
    return ([str(d / "A.gff"), str(d / "B.gff")],
            dict(fwd_start=fwd_start, rc_start=rc_start, ln=len(mut)))


def _regions_on_genome_b(res):
    """(start, end, strand) of regions assigned to geneX's group on B."""
    gx = list(res.gene_store.names).index("geneX")
    grp = res.group_of_gene[gx]
    r = res.regions
    sel = (np.asarray(r.group) == grp) & (np.asarray(r.genome) == 1)
    return [(int(r.start[i]), int(r.end[i]), int(r.strand[i]))
            for i in np.flatnonzero(sel)]


def test_no_fallback_misses_unseeded_copy(unseeded_case, tmp_path):
    paths, _ = unseeded_case
    res = pipeline.run(paths, PipelineConfig(prefix="NF", nucl_only=True),
                       out_dir=str(tmp_path))
    assert _regions_on_genome_b(res) == []


def test_exhaustive_fallback_recovers_unseeded_copy(unseeded_case,
                                                    tmp_path):
    paths, c = unseeded_case
    res = pipeline.run(
        paths, PipelineConfig(prefix="EF", nucl_only=True,
                              exhaustive_fallback=True),
        out_dir=str(tmp_path))
    found = _regions_on_genome_b(res)
    strands = {f[2] for f in found}
    assert 1 in strands and -1 in strands, found
    for (s, e, strand) in found:
        want = c["fwd_start"] if strand > 0 else c["rc_start"]
        assert abs(s - want) <= 10, (s, want)
        assert abs((e - s + 1) - c["ln"]) <= 20


def test_profile_candidate_source_matches_minimizer(sim4, tmp_path):
    _, paths = sim4
    r1 = pipeline.run(paths, PipelineConfig(prefix="P"),
                      out_dir=str(tmp_path / "min"))
    r2 = pipeline.run(paths,
                      PipelineConfig(prefix="P",
                                     candidate_source="profile"),
                      out_dir=str(tmp_path / "prof"))
    # identical partitions (labels may differ): compare co-membership
    a, b = r1.group_of_gene, r2.group_of_gene
    assert len(a) == len(b)
    ra = {}
    for x, y in zip(a, b):
        assert ra.setdefault(int(x), int(y)) == int(y)
    rb = {}
    for x, y in zip(b, a):
        assert rb.setdefault(int(x), int(y)) == int(y)


def test_exhaustive_fallback_mesh_identical(unseeded_case, tmp_path):
    # the exhaustive sweep (best_windows + the chunked, shard_map'd
    # stats pass — round 5) must be byte-identical mesh-on vs mesh-off
    paths, _c = unseeded_case
    r1 = pipeline.run(
        paths, PipelineConfig(prefix="EM", nucl_only=True,
                              exhaustive_fallback=True),
        out_dir=str(tmp_path / "o1"))
    r2 = pipeline.run(
        paths, PipelineConfig(prefix="EM", nucl_only=True,
                              exhaustive_fallback=True,
                              mesh_data=4, mesh_db=2),
        out_dir=str(tmp_path / "o2"))
    import numpy as np
    assert np.array_equal(r1.group_of_gene, r2.group_of_gene)
    for k in r1.outputs:
        a = open(r1.outputs[k], "rb").read()
        b = open(r2.outputs[k], "rb").read()
        assert a == b, f"{k} differs between mesh and single-device runs"


def test_gather_shard_cache_reuse():
    # _gather_sharded must reuse one compiled executable per
    # (mesh, which, scoring params) — per-call partials would retrace
    # in the per-group resplit loop (round-5 review)
    import numpy as np

    from peppan_tpu.ops import pairs as prs, sw
    from peppan_tpu.parallel import mesh as meshmod

    mesh = meshmod.make_mesh(data=4, db=2)
    scorer = sw.dna_scorer()
    import jax
    tokens = jax.device_put(
        np.random.default_rng(0).integers(0, 4, (32, 64)).astype(np.int8))
    qi = np.arange(16, dtype=np.int32)
    ti = np.roll(qi, 1)
    prs._gather_shard_cache.clear()
    a = np.asarray(prs._gather_sharded(
        mesh, "scores", tokens, qi, ti, scorer=scorer, gap_open=5,
        gap_extend=2, band=32))
    n1 = len(prs._gather_shard_cache)
    b = np.asarray(prs._gather_sharded(
        mesh, "scores", tokens, qi, ti, scorer=scorer, gap_open=5,
        gap_extend=2, band=32))
    assert len(prs._gather_shard_cache) == n1 == 1
    assert np.array_equal(a, b)
    # and the sharded result equals the plain launch
    c = np.asarray(prs._gather_scores(tokens, jax.numpy.asarray(qi),
                                      jax.numpy.asarray(ti), scorer=scorer,
                                      gap_open=5, gap_extend=2, band=32))
    assert np.array_equal(a, c)
