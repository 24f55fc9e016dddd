"""Self-consistency golden snapshot (SURVEY.md §7.6).

With the reference mount empty, the committed fixture under
fixtures/ref4/expected/ IS the output contract: the pipeline must
reproduce it byte-for-byte from the committed input GFFs.  Intentional
semantic changes must regenerate the fixture (see the generator snippet in
the git history) and explain the diff in the commit message.
"""

import os

import pytest

from peppan_tpu import pipeline
from peppan_tpu.config import PipelineConfig

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "ref4")


def test_outputs_match_committed_fixture(tmp_path):
    gffs = sorted(
        os.path.join(FIX, "gff", f) for f in os.listdir(os.path.join(FIX, "gff")))
    res = pipeline.run(gffs, PipelineConfig(prefix="REF"),
                       out_dir=str(tmp_path))
    assert len(res.group_names) > 0
    for fname in sorted(os.listdir(os.path.join(FIX, "expected"))):
        got = open(os.path.join(str(tmp_path), fname)).read()
        want = open(os.path.join(FIX, "expected", fname)).read()
        assert got == want, f"{fname} diverged from committed fixture"
