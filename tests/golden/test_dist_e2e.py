"""2-process END-TO-END determinism (round-4 verdict directive 6;
SURVEY §4.2.3-4, §5.8): the full pipeline runs under two real processes
federated over a localhost coordinator (4+4 virtual CPU devices, mesh
data=4 x db=2 spanning both processes) and process 0's output files must
be byte-identical to a single-process run of the same inputs.

Exercises the multi-process data path end to end: device_put of host
arrays onto process-spanning shardings, jit-inserted collectives over
the global mesh, and utils.fetch.fetch_np's process_allgather for
non-fully-addressable results.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from peppan_tpu.parallel import dist

coord, pid, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
dist.initialize(coordinator=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2

from peppan_tpu import pipeline
from peppan_tpu.config import PipelineConfig
from peppan_tpu.utils import simulate

sim = simulate.simulate(n_genomes=3, n_core=8, n_accessory=3, seed=73)
paths = simulate.write_gff(sim, out_dir + "/gff")
res = pipeline.run(paths, PipelineConfig(prefix="DP", mesh_data=4,
                                         mesh_db=2, sw_batch=256),
                   out_dir=out_dir + "/out")
print("WORKER_DONE", pid, len(res.regions))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_pipeline_byte_identical(tmp_path):
    from peppan_tpu import pipeline
    from peppan_tpu.config import PipelineConfig
    from peppan_tpu.utils import simulate

    # reference: single-process run (mesh off — byte-identity across
    # mesh configurations is the established invariant)
    sim = simulate.simulate(n_genomes=3, n_core=8, n_accessory=3, seed=73)
    ref_paths = simulate.write_gff(sim, str(tmp_path / "ref_gff"))
    ref = pipeline.run(ref_paths, PipelineConfig(prefix="DP",
                                                 sw_batch=256),
                       out_dir=str(tmp_path / "ref_out"))

    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    dirs = [str(tmp_path / f"p{pid}") for pid in range(2)]
    for d in dirs:
        os.makedirs(d, exist_ok=True)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, coord, str(pid), dirs[pid]],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=800)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and "UNAVAILABLE" in out:
            pytest.skip(f"distributed runtime unavailable: {out[-300:]}")
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_DONE {pid}" in out, out[-1500:]

    # byte-compare every output file of process 0 against the reference
    ref_files = {os.path.basename(v): v for v in ref.outputs.values()}
    assert ref_files
    for name, ref_path in sorted(ref_files.items()):
        got_path = os.path.join(dirs[0], "out", name)
        assert os.path.exists(got_path), name
        with open(ref_path, "rb") as fa, open(got_path, "rb") as fb:
            assert fa.read() == fb.read(), f"{name} differs"
