"""--continue resume semantics (SURVEY.md §5.3/§5.4): identical outputs,
phases actually skipped, stale cache rejected on input change."""

import os
import time

import numpy as np
import pytest

from peppan_tpu import pipeline
from peppan_tpu.config import PipelineConfig
from peppan_tpu.utils import simulate


def _outputs_bytes(res):
    return {k: open(p, "rb").read() for k, p in res.outputs.items()}


def test_resume_identical_and_faster(tmp_path):
    sim = simulate.simulate(n_genomes=3, n_core=8, n_accessory=3, seed=41)
    paths = simulate.write_gff(sim, str(tmp_path / "gff"))
    out = str(tmp_path / "out")
    cfg = PipelineConfig(prefix="RES", continue_run=True, sw_batch=4096)
    r1 = pipeline.run(paths, cfg, out_dir=out)
    b1 = _outputs_bytes(r1)
    assert os.path.exists(os.path.join(out, "RES.phase_cache",
                                       "manifest.json"))
    r2 = pipeline.run(paths, cfg, out_dir=out)
    b2 = _outputs_bytes(r2)
    assert b1 == b2
    # resumed phases are near-instant
    assert r2.phase_seconds["cluster"] < max(
        0.5 * r1.phase_seconds["cluster"], 0.5)


def test_stale_cache_rejected_on_input_change(tmp_path):
    sim = simulate.simulate(n_genomes=3, n_core=6, n_accessory=2, seed=43)
    paths = simulate.write_gff(sim, str(tmp_path / "gff"))
    out = str(tmp_path / "out")
    cfg = PipelineConfig(prefix="ST", continue_run=True, sw_batch=4096)
    r1 = pipeline.run(paths, cfg, out_dir=out)
    # modify one input file -> hash changes -> phases recompute
    time.sleep(0.01)
    with open(paths[0], "a") as fh:
        fh.write("# touched\n")
    r2 = pipeline.run(paths, cfg, out_dir=out)
    # result is still computed (not the poisoned cache path), groups sane
    assert len(r2.group_names) == len(r1.group_names)


def test_config_change_invalidates_cache(tmp_path):
    sim = simulate.simulate(n_genomes=3, n_core=6, n_accessory=2, seed=44)
    paths = simulate.write_gff(sim, str(tmp_path / "gff"))
    out = str(tmp_path / "out")
    r1 = pipeline.run(paths, PipelineConfig(prefix="CC", continue_run=True,
                                            sw_batch=4096), out_dir=out)
    # different threshold -> different cfg repr -> cache must not be reused
    r2 = pipeline.run(paths, PipelineConfig(prefix="CC", continue_run=True,
                                            sw_batch=4096,
                                            clust_identity=0.95),
                      out_dir=out)
    assert r2 is not None  # recomputed without error


def test_launch_cache_resume(tmp_path):
    """Launch-granular resume inside genome_map: the second run replays
    every launch from the cache (0 device launches) byte-identically; a
    key change wipes the stale entries."""
    import dataclasses

    from peppan_tpu.io import gff
    from peppan_tpu.ops import genome_map
    from peppan_tpu.utils import manifest, metrics

    sim = simulate.simulate(n_genomes=3, n_core=8, n_accessory=3, seed=43)
    paths = simulate.write_gff(sim, str(tmp_path / "gff"))
    genomes, genes = gff.load_genomes(paths)
    gindex = genome_map.index_genomes(genomes)
    ex = np.arange(genes.n_genes)

    d = str(tmp_path / "lc")
    lc = manifest.LaunchCache(d, key="k1")
    metrics.reset()
    h1 = genome_map.map_exemplars(genes, genomes, ex, gindex,
                                  launch_cache=lc)
    n_launch_1 = metrics.snapshot().get("sw_launches", 0)
    assert n_launch_1 > 0

    lc2 = manifest.LaunchCache(d, key="k1")      # same key: entries kept
    metrics.reset()
    h2 = genome_map.map_exemplars(genes, genomes, ex, gindex,
                                  launch_cache=lc2)
    assert metrics.snapshot().get("sw_launches", 0) == 0
    for f in dataclasses.fields(genome_map.MapHits):
        assert np.array_equal(getattr(h1, f.name), getattr(h2, f.name)), \
            f.name

    manifest.LaunchCache(d, key="k2")            # key change: wiped
    assert not [f for f in os.listdir(d) if f.endswith(".npz")]


def test_verify_pairs_launch_cache_resume(tmp_path):
    """Launch-granular resume for the cluster/similarity verification
    sweeps (the ex-TileRunner role): replayed runs do 0 device launches
    and return byte-identical PairHits."""
    import dataclasses

    from peppan_tpu.io import gff
    from peppan_tpu.ops import pairs as prs
    from peppan_tpu.utils import manifest, metrics

    sim = simulate.simulate(n_genomes=3, n_core=8, n_accessory=3, seed=45)
    paths = simulate.write_gff(sim, str(tmp_path / "gff"))
    _, genes = gff.load_genomes(paths)
    table = prs.build_minimizer_table(genes)
    cand, _, _ = prs.candidate_pairs(table)
    assert len(cand) > 0

    d = str(tmp_path / "lc")
    lc = manifest.LaunchCache(d, key="vp1")
    metrics.reset()
    h1 = prs.verify_pairs(genes, cand, batch=256, launch_cache=lc)
    assert metrics.snapshot().get("sw_launches", 0) > 0

    lc2 = manifest.LaunchCache(d, key="vp1")
    metrics.reset()
    h2 = prs.verify_pairs(genes, cand, batch=256, launch_cache=lc2)
    assert metrics.snapshot().get("sw_launches", 0) == 0
    for f in dataclasses.fields(prs.PairHits):
        assert np.array_equal(getattr(h1, f.name), getattr(h2, f.name)), \
            f.name
