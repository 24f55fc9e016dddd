"""End-to-end M1 pipeline test against simulator ground truth.

SURVEY.md §7.3.6: with the reference mount empty, the oracle for end-to-end
correctness is the simulator's known ortholog families — recovered groups
must induce the same partition of genes as the truth labels.
"""

import os

import numpy as np
import pytest

from peppan_tpu import pipeline
from peppan_tpu.config import PipelineConfig


@pytest.fixture(scope="module")
def result(sim4, tmp_path_factory):
    sim, paths = sim4
    out = tmp_path_factory.mktemp("m1_out")
    cfg = PipelineConfig(prefix="TEST", sw_batch=4096)
    return sim, pipeline.run(paths, cfg, out_dir=str(out))


def _partition_equal(labels_a, labels_b):
    """Two label arrays induce the same partition?"""
    map_ab, map_ba = {}, {}
    for a, b in zip(labels_a, labels_b):
        if a in map_ab and map_ab[a] != b:
            return False
        if b in map_ba and map_ba[b] != a:
            return False
        map_ab[a] = b
        map_ba[b] = a
    return True


def test_groups_match_truth(result):
    sim, res = result
    truth = [sim.truth[name] for name in res.gene_store.names]
    assert _partition_equal(truth, list(res.group_of_gene))


def test_output_files_exist(result):
    _, res = result
    for key, path in res.outputs.items():
        assert os.path.exists(path), key
        assert os.path.getsize(path) > 0, key


def test_gene_content_matrix(result):
    sim, res = result
    lines = open(res.outputs["rtab"]).read().splitlines()
    header = lines[0].split("\t")
    assert header[0] == "Gene"
    assert header[1:] == sim.genome_names
    # core families present in every genome
    truth_by_family = {}
    for name, fam in sim.truth.items():
        truth_by_family.setdefault(fam, set()).add(name.rsplit("_", 1)[0])
    n_core_truth = sum(1 for fam, gs in truth_by_family.items()
                      if len(gs) == len(sim.genome_names))
    n_core_ours = sum(1 for ln in lines[1:]
                      if all(c == "1" for c in ln.split("\t")[1:]))
    assert n_core_ours == n_core_truth


def test_pipeline_deterministic(sim4, tmp_path_factory):
    sim, paths = sim4
    cfg = PipelineConfig(prefix="DET", sw_batch=4096)
    out1 = tmp_path_factory.mktemp("det1")
    out2 = tmp_path_factory.mktemp("det2")
    r1 = pipeline.run(paths, cfg, out_dir=str(out1))
    r2 = pipeline.run(paths, cfg, out_dir=str(out2))
    for key in r1.outputs:
        a = open(r1.outputs[key], "rb").read()
        b = open(r2.outputs[key], "rb").read()
        assert a == b, f"output {key} differs between runs"
