"""Multi-host (multi-slice / DCN) initialization.

The reference scaled past one node with MPI (``mpiexec -n N``,
SURVEY.md §2.3 MPICH row); the TPU-native equivalent is the JAX
distributed runtime: every host process calls
``jax.distributed.initialize`` and then sees the GLOBAL device set, so
the same ``make_mesh`` + ``shard_map`` pipeline runs unchanged — XLA
routes the pencil-FFT all_to_alls over ICI within a slice and DCN
across slices.  Lay the mesh out so the small axis (the CIC halo
``ppermute`` and binning ``psum``) stays intra-slice: pass the
per-slice device count as ``inner``.

Single-process environments (tests, one-chip dev boxes) skip
initialization and behave identically.

Usage on each host (e.g. under a SLURM/GKE launcher)::

    from vpower_tpu.parallel import multihost
    multihost.initialize()                    # env-driven (TPU pods)
    # or explicitly:
    multihost.initialize("10.0.0.1:9999", num_processes=4, process_id=i)
    mesh = multihost.global_mesh(inner=4)     # 4 chips per slice axis
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = ["initialize", "global_mesh", "is_multiprocess"]

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Start the JAX distributed runtime (idempotent).

    With no arguments, jax auto-discovers the topology from the TPU
    pod / cluster environment variables; explicit arguments mirror
    ``jax.distributed.initialize``.  No-op when called twice or when
    there is only one process and no coordinator is given.
    """
    global _initialized
    if _initialized:
        return
    import jax

    if coordinator_address is None and num_processes in (None, 1):
        # single-process: nothing to initialize (jax.distributed would
        # try to bind a coordinator; tests and 1-host runs skip it)
        _initialized = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True


def is_multiprocess() -> bool:
    import jax

    return jax.process_count() > 1


def global_mesh(inner: Optional[int] = None, axis_names=("x", "y")):
    """2-D mesh over the GLOBAL device set with the 'y' (inner) axis
    kept within a host/slice when ``inner`` divides the local device
    count — the layout that keeps halo ppermutes and the binning psum
    on ICI and pays DCN only inside the all_to_all pencil transposes."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    n = len(devices)
    if inner is None:
        inner = jax.local_device_count()
        while n % inner != 0:
            inner -= 1
    assert n % inner == 0, "inner axis must divide the device count"
    arr = np.asarray(devices).reshape(n // inner, inner)
    return Mesh(arr, axis_names)
