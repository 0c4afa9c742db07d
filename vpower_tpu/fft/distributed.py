"""Pencil-decomposed distributed 3-D FFT over a 2-D device mesh.

TPU-native replacement for the reference's FFTW-per-rank + phase-DFT
design (``scripts/parallel_optimized.py:92-141, 377-379``): instead of
each rank FFT-ing a private folded box, the grid itself is sharded
(X/px, Y/py, Z full) over a ``jax.sharding.Mesh`` and transformed with
local FFTs along the unsharded axis plus two ``jax.lax.all_to_all``
pencil transposes over ICI (SURVEY.md §2.3 "FFTW" replacement row).

Layout walk (global array F[N, N, N], mesh axes ('x', 'y') of sizes
(px, py); local blocks in brackets):

    start      [N/px, N/py, N   ]   FFT along z
    a2a('y')   [N/px, N,    N/py]   FFT along y
    a2a('x')   [N,    N/px, N/py]   FFT along x

The final layout (X full, Y sharded by x-rank, Z sharded by y-rank) is
exactly what spectrum binning wants — no back-transpose is ever needed:
each device bins its block with global k offsets and the mesh psum
produces the full spectrum (see
:func:`vpower_tpu.spectrum.power.shell_bin_local`).

All functions here are *local* functions meant to be called inside
``jax.shard_map``.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "pencil_fftn",
    "pencil_output_starts",
    "pencil_power_vector",
    "pencil_power_scalar",
]


def pencil_fftn(
    local: jax.Array, axis_names: Tuple[str, str] = ("x", "y")
) -> jax.Array:
    """3-D FFT of a globally (X/px, Y/py, Z) sharded array; call inside
    ``shard_map``.  Returns the local block in (X full, Y/x, Z/y) layout."""
    ax, ay = axis_names
    # FFT along the locally-full z axis.
    local = jnp.fft.fft(local, axis=2)
    # Transpose pencils: unshard Y, shard Z over the y axis.
    local = jax.lax.all_to_all(local, ay, split_axis=2, concat_axis=1, tiled=True)
    local = jnp.fft.fft(local, axis=1)
    # Unshard X, shard Y over the x axis.
    local = jax.lax.all_to_all(local, ax, split_axis=1, concat_axis=0, tiled=True)
    return jnp.fft.fft(local, axis=0)


def pencil_output_starts(
    n_full: int, axis_names: Tuple[str, str] = ("x", "y")
) -> jax.Array:
    """(3,) global index offsets of this device's block in the
    pencil-FFT OUTPUT layout (X full, Y sharded by x-rank, Z sharded by
    y-rank)."""
    ax, ay = axis_names
    px = jax.lax.axis_size(ax)
    py = jax.lax.axis_size(ay)
    rx = jax.lax.axis_index(ax)
    ry = jax.lax.axis_index(ay)
    return jnp.stack(
        [jnp.zeros_like(rx), rx * (n_full // px), ry * (n_full // py)]
    )


def pencil_power_vector(
    local_v: jax.Array,
    box_size: float,
    n_full: int,
    axis_names: Tuple[str, str] = ("x", "y"),
) -> jax.Array:
    """Power grid of a sharded CHANNELS-FIRST (C, .., .., ..) real or
    complex vector field: sequential per-component pencil FFTs,
    ``P = 0.5 sum |a F|^2`` (normalization contract of
    ``_vector_power``, reference ``interp.py:1372-1387``; sequential
    components as in ``parallel_disk_vector.py:429-440``)."""
    a = (box_size / (2.0 * jnp.pi)) ** 1.5 / float(n_full) ** 3
    acc = None
    for c in range(local_v.shape[0]):
        fk = pencil_fftn(local_v[c], axis_names)
        p = 0.5 * (jnp.real(fk) ** 2 + jnp.imag(fk) ** 2)
        acc = p if acc is None else acc + p
    return acc * (a * a)


def pencil_power_scalar(
    local_f: jax.Array,
    box_size: float,
    n_full: int,
    axis_names: Tuple[str, str] = ("x", "y"),
) -> jax.Array:
    a = (box_size / (2.0 * jnp.pi)) ** 1.5 / float(n_full) ** 3
    fk = pencil_fftn(local_f, axis_names)
    return 0.5 * (jnp.real(fk) ** 2 + jnp.imag(fk) ** 2) * (a * a)
