"""Device-mesh helpers: the TPU replacement for ``MPI.COMM_WORLD``.

The reference binds ranks to sub-boxes by hand
(``parallel_optimized.py:202-236``); here a 2-D
``jax.sharding.Mesh`` over ('x', 'y') carries the same role, with XLA
collectives over ICI replacing ``allgather``/``Reduce``
(SURVEY.md §2.3 "MPICH" row).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "mesh_shape_for"]


def mesh_shape_for(n_devices: int) -> Tuple[int, int]:
    """Most-square (px, py) factorization with px >= py — balanced
    pencil dimensions minimize the larger all-to-all."""
    py = int(np.floor(np.sqrt(n_devices)))
    while n_devices % py != 0:
        py -= 1
    return n_devices // py, py


def make_mesh(
    n_devices: Optional[int] = None,
    shape: Optional[Tuple[int, int]] = None,
    devices=None,
) -> Mesh:
    """2-D ('x', 'y') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if shape is None:
        shape = mesh_shape_for(n_devices)
    px, py = shape
    assert px * py == n_devices, "mesh shape must cover n_devices exactly"
    arr = np.asarray(devices[: px * py]).reshape(px, py)
    return Mesh(arr, ("x", "y"))
