"""Multi-process ``jax.distributed`` transport — executed for real.

The reference's production transport was MPI (``mpiexec -n N python
scripts/parallel_optimized.py``, ``/root/reference/README.md:28-31``);
ours is the JAX distributed runtime (``parallel/multihost.py``).  This
test actually RUNS the non-trivial branch: two coordinated processes,
4 virtual CPU devices each (gloo collectives), building the global
mesh and computing a spectrum that must equal the single-process
result — the "multi-node without a cluster" rung of the test pyramid
(SURVEY.md §4c).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(
    jax.default_backend() != "cpu",
    reason="2-process harness coordinates CPU processes",
)
def test_two_process_distributed_matches_single_process(tmp_path):
    port = _free_port()
    out = str(tmp_path / "proc0.npz")
    workers = []
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker pins its own device count
    for pid in range(2):
        workers.append(subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multiproc_worker.py"),
             str(pid), "2", str(port), out],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        ))
    logs = []
    for w in workers:
        try:
            stdout, _ = w.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for ww in workers:
                ww.kill()
            raise
        logs.append(stdout.decode())
    for pid, (w, log) in enumerate(zip(workers, logs)):
        assert w.returncode == 0, f"worker {pid} failed:\n{log}"
        assert f"worker {pid} OK" in log

    got = np.load(out)

    # single-process reference on the same 8 virtual devices, same mesh
    # layout (this pytest session already runs with 8 CPU devices)
    from vpower_tpu import synthetic_particles
    from vpower_tpu.parallel import distributed_spectrum, multihost

    mesh = multihost.global_mesh(inner=4)
    assert mesh.devices.shape == (2, 4)
    particles = synthetic_particles(jax.random.PRNGKey(8), 8,
                                    box_size=1.0, jitter=0.3)
    ref = distributed_spectrum(particles, 8, mesh, method="cic",
                               quantity="velocity")
    np.testing.assert_array_equal(got["Nsample"], ref.Nsample)
    np.testing.assert_allclose(got["Psum"], ref.Psum, rtol=1e-5,
                               atol=1e-12)
    assert np.isfinite(got["sweep_Psum"]).all()
    assert got["sweep_Nsample"].sum() > 0
