"""Worker for the 2-process ``jax.distributed`` test — the TPU-native
analog of the reference's ``mpiexec -n N`` transport
(``/root/reference/README.md:28-31``): every process initializes the
JAX distributed runtime against a shared coordinator, sees the GLOBAL
device set, and runs the SAME SPMD program; collectives ride the
runtime (gloo on CPU here, ICI/DCN on pods).

Run by ``tests/test_multiprocess.py`` as::

    python tests/multiproc_worker.py <pid> <nproc> <port> <out.npz>

with 4 virtual CPU devices per process (8 global).  Process 0 writes
the combined spectrum to ``out.npz``.
"""
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
out = sys.argv[4]

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4 "
    + os.environ.get("XLA_FLAGS", "")
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from vpower_tpu.parallel import multihost  # noqa: E402

multihost.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                     process_id=pid)
assert multihost.is_multiprocess(), "distributed runtime did not start"
assert jax.process_count() == nproc
assert jax.device_count() == 4 * nproc, jax.devices()
assert jax.local_device_count() == 4

mesh = multihost.global_mesh(inner=4)
assert mesh.devices.shape == (nproc, 4)

import jax.numpy as jnp  # noqa: E402

from vpower_tpu import synthetic_particles  # noqa: E402
from vpower_tpu.parallel import distributed_spectrum  # noqa: E402

# identical deterministic inputs on every process (the reference loaded
# the full snapshot on every rank, ``parallel_optimized.py:272-276``)
particles = synthetic_particles(jax.random.PRNGKey(8), 8, box_size=1.0,
                                jitter=0.3)
float(jnp.sum(particles.pos))  # materialize before the SPMD section

s = distributed_spectrum(particles, 8, mesh, method="cic",
                         quantity="velocity")

# exercise the multi-controller exact-NN fallback warning path
import warnings  # noqa: E402

from vpower_tpu.parallel import distributed_streamed_sweep  # noqa: E402

with warnings.catch_warnings(record=True) as rec:
    warnings.simplefilter("always")
    sweep = distributed_streamed_sweep(
        particles, 4, 2, mesh, quantity="velocity", method="nn",
        margin_cells=2, exact=True, certify=False,
        beta_sequence=np.array([[0, 0, 0]]), beta_batch=1,
    )
got_warning = any("multi-host mesh" in str(w.message) for w in rec)
assert got_warning, "expected the multi-controller exact-NN fallback warning"

if pid == 0:
    np.savez(out, Psum=s.Psum, Nsample=s.Nsample, k=s.k,
             sweep_Psum=sweep[(0, 0, 0)].Psum,
             sweep_Nsample=sweep[(0, 0, 0)].Nsample)
print(f"worker {pid} OK", flush=True)
