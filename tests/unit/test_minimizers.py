import numpy as np

from peppan_tpu.io import alphabet as ab
from peppan_tpu.ops import minimizers as mz


def _np_canonical_kmers(seq, k):
    """Independent numpy oracle for canonical k-mer packing."""
    out = []
    for i in range(len(seq) - k + 1):
        win = seq[i:i + k]
        if (win >= 4).any():
            out.append(None)
            continue
        fwd = 0
        rc = 0
        for j, c in enumerate(win):
            fwd = (fwd << 2) | int(c)
            rc = rc | ((3 - int(c)) << (2 * j))
        out.append(min(fwd, rc))
    return out


def _np_mix(x):
    x = np.uint32(x)
    x ^= x >> np.uint32(16)
    x = np.uint32((int(x) * 0x85EBCA6B) & 0xFFFFFFFF)
    x ^= x >> np.uint32(13)
    x = np.uint32((int(x) * 0xC2B2AE35) & 0xFFFFFFFF)
    x ^= x >> np.uint32(16)
    return min(int(x), 0xFFFFFFFE)


def test_kmer_hashes_match_numpy_oracle(rng):
    k = 7
    seq = rng.integers(0, 4, size=40).astype(np.int8)
    seq[10] = ab.DNA_N  # invalidates k-mers overlapping position 10
    h, _ = mz.kmer_hashes(seq[None, :], k)
    h = np.asarray(h)[0]
    expect = _np_canonical_kmers(seq, k)
    for i, e in enumerate(expect):
        if e is None:
            assert h[i] == mz.INVALID_HASH, i
        else:
            assert h[i] == _np_mix(e), i
    # tail positions past L-k are invalid
    assert (h[len(seq) - k + 1:] == mz.INVALID_HASH).all()


def test_revcomp_invariance(rng):
    """Canonical hashing: a sequence and its reverse complement share the
    same minimizer hash multiset (the basis for strand-agnostic seeding)."""
    seq = rng.integers(0, 4, size=60).astype(np.int8)
    rc = ab.revcomp(seq)
    h1, _ = mz.kmer_hashes(seq[None, :], 9)
    h2, _ = mz.kmer_hashes(rc[None, :], 9)
    v1 = np.sort(np.asarray(h1)[0][np.asarray(h1)[0] != mz.INVALID_HASH])
    v2 = np.sort(np.asarray(h2)[0][np.asarray(h2)[0] != mz.INVALID_HASH])
    assert np.array_equal(v1, v2)


def test_minimizer_flags_basic(rng):
    k, w = 5, 4
    seq = rng.integers(0, 4, size=50).astype(np.int8)
    h, _ = mz.kmer_hashes(seq[None, :], k)
    f = np.asarray(mz.minimizer_flags(h, w))[0]
    h = np.asarray(h)[0]
    L = len(seq)
    # oracle: leftmost argmin of each complete window
    expect = np.zeros(L, dtype=bool)
    for s in range(L - w + 1):
        win = h[s:s + w]
        if (win == mz.INVALID_HASH).all():
            continue
        expect[s + int(np.argmin(win))] = True
    assert np.array_equal(f, expect)


def test_minimizer_density(rng):
    # expected density of w-window minimizers is ~2/(w+1)
    seq = rng.integers(0, 4, size=4000).astype(np.int8)
    h, _ = mz.kmer_hashes(seq[None, :], 13)
    f = np.asarray(mz.minimizer_flags(h, 8))[0]
    density = f.sum() / len(seq)
    assert 0.15 < density < 0.30


def test_shared_minimizers_of_mutated_copy(rng):
    from peppan_tpu.io.tokens import GeneStore
    from peppan_tpu.ops import pairs as prs

    base = rng.integers(0, 4, size=600).astype(np.int8)
    mut = base.copy()
    mpos = rng.random(600) < 0.03
    mut[mpos] = (mut[mpos] + 1) % 4
    unrelated = rng.integers(0, 4, size=600).astype(np.int8)
    store = GeneStore.from_sequences([base, mut, unrelated])
    table = prs.build_minimizer_table(store, k=13, w=8)
    p, shared, diag = prs.candidate_pairs(table)
    pset = {tuple(x) for x in p}
    assert (0, 1) in pset
    assert (0, 2) not in pset and (1, 2) not in pset
    i = [tuple(x) for x in p].index((0, 1))
    assert shared[i] >= 5
    assert diag[i] == 0


def test_candidate_pairs_all_self_pairs():
    """A hash group whose occurrences are all from ONE gene must not crash
    (regression: empty pair set after self-pair filtering)."""
    from peppan_tpu.ops import pairs as prs
    import numpy as np
    table = prs.MinimizerTable(
        hash=np.array([7, 7], np.uint32),
        gene=np.array([3, 3], np.int32),
        pos=np.array([0, 50], np.int32),
        strand=np.array([True, True]))
    p, s, d = prs.candidate_pairs(table)
    assert len(p) == 0 and len(s) == 0 and len(d) == 0


def test_exact_duplicate_dedup_and_priority(rng):
    """Byte-identical genes collapse before alignment; --priority steers
    exemplar choice."""
    import numpy as np
    from peppan_tpu.io.tokens import GeneStore
    from peppan_tpu.cluster import linclust

    base = rng.integers(0, 4, 300).astype(np.int8)
    store = GeneStore.from_sequences(
        [base, base.copy(), base.copy()], genome=[0, 1, 2])
    res = linclust.cluster_genes(store)
    assert res.n_clusters == 1
    assert int(res.exemplar[0]) == 0          # smallest index by default
    # priority: genome 2 trusted most -> its gene becomes exemplar
    res2 = linclust.cluster_genes(
        store, genome_priority=np.array([2, 1, 0]))
    assert int(res2.exemplar[0]) == 2


def test_matched_sketch_equals_dense_on_members(rng):
    """The bloom-filtered compacted sketch must return EXACTLY the dense
    sketch rows whose hash top-bits pass the membership test — which is a
    superset of true query matches and a subset of all minimizers; any
    downstream equi-join on the query set is therefore unchanged."""
    import jax.numpy as jnp
    import numpy as np
    from peppan_tpu.ops import minimizers as mz

    toks = rng.integers(0, 4, (8, 512)).astype(np.int8)
    rr, cc, hv, sv = mz.sketch_flagged(toks, 13, 8)
    # query set = every other distinct hash
    qh = np.unique(hv)[::2]
    bits = mz.BLOOM_BITS_DNA
    bloom = mz.make_hash_bloom(qh, bits)
    r2, c2, h2, s2 = mz.sketch_flagged_matched(
        toks, jnp.asarray(bloom), k=13, w=8, cap=512, bits=bits)
    # expected: dense rows whose top `bits` land on a set bloom bit
    idx = (hv.astype(np.uint64) >> np.uint64(32 - bits)).astype(np.int64)
    member = (bloom[idx >> 5] >> (idx & 31).astype(np.uint32)) & 1 == 1
    assert np.array_equal(r2, rr[member])
    assert np.array_equal(c2, cc[member])
    assert np.array_equal(h2, hv[member])
    assert np.array_equal(s2, sv[member])
    # every query-matching minimizer survives (no false negatives)
    in_q = np.isin(hv, qh)
    assert np.isin(hv[in_q], h2).all()


def test_matched_sketch_aa_and_overflow(rng):
    """AA variant agrees with the dense path; a cap smaller than the
    match count triggers the exact dense fallback."""
    import jax.numpy as jnp
    import numpy as np
    from peppan_tpu.ops import minimizers as mz

    toks = rng.integers(0, 20, (4, 512)).astype(np.int8)
    rr, cc, hv = mz.aa_sketch_flagged(toks, 7, 6)
    qh = np.unique(hv)          # everything matches
    bloom = jnp.asarray(mz.make_hash_bloom(qh, mz.BLOOM_BITS_AA))
    # generous cap: all minimizers come back (bloom passes everything)
    r2, c2, h2 = mz.aa_sketch_flagged_matched(toks, bloom, k=7, w=6,
                                              cap=512)
    assert np.array_equal(r2, rr) and np.array_equal(c2, cc)
    assert np.array_equal(h2, hv)
    # overflowing cap: falls back to the dense fetch, still exact
    from peppan_tpu.utils import metrics
    before = metrics.snapshot().get("sketch_match_overflows", 0)
    r3, c3, h3 = mz.aa_sketch_flagged_matched(toks, bloom, k=7, w=6,
                                              cap=8)
    assert metrics.snapshot().get("sketch_match_overflows", 0) == before + 1
    assert np.array_equal(r3, rr) and np.array_equal(c3, cc)
    assert np.array_equal(h3, hv)


def test_sketch_topm_equals_host_rank(rng):
    """Device top-m sketch (round 4, the clu_t_seed wall fix) must be
    bit-identical to ranking the full sketch per row by (masked hash,
    position) and keeping rank < m — including hash-tie boundaries and
    rows with fewer than m minimizers."""
    import numpy as np
    from peppan_tpu.ops import minimizers as mz

    toks = rng.integers(0, 4, (16, 700)).astype(np.int8)
    toks[3, 100:] = 5          # short row: fewer minimizers than m
    toks[5] = toks[4]          # duplicate rows -> identical selections
    toks[7, :350] = toks[7, 350:]  # repeated half: forced hash ties
    for m in (5, 20, 1000):    # 1000 > any row's minimizer count
        rows, cols, hv, sv = mz.sketch_flagged(toks, 13, 8)
        # host oracle: stable rank by (hash, pos) within each row
        sel_r, sel_c, sel_h, sel_s = [], [], [], []
        for r in range(16):
            mask = rows == r
            order = np.argsort(hv[mask], kind="stable")  # pos-asc stable
            take = order[:m]
            take.sort()
            sel_r.append(np.full(len(take), r))
            sel_c.append(cols[mask][take])
            sel_h.append(hv[mask][take])
            sel_s.append(sv[mask][take])
        oracle = (np.concatenate(sel_r), np.concatenate(sel_c),
                  np.concatenate(sel_h), np.concatenate(sel_s))
        got = mz.sketch_topm(toks, 13, 8, m)
        # topm returns hash-sorted order per row; canonicalize both sides
        def canon(t):
            r, c, h, s = t
            o = np.lexsort((c, r))
            return r[o], c[o], h[o], s[o]
        for a, b in zip(canon(oracle), canon(got)):
            assert np.array_equal(a, b)
