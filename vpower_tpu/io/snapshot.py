"""Snapshot I/O: Gadget/AREPO-style HDF5 -> host numpy -> device arrays.

Equivalent of the reference's ``load_snapshot`` (``vpower/interp.py:84-131``)
plus ``init_dir`` (``interp.py:56-79``).  The device placement is explicit
(``jax.device_put``) so multi-host variants can shard the host arrays
before transfer.
"""
from __future__ import annotations

import os
import shutil
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..core.particles import Particles

__all__ = ["load_snapshot", "save_snapshot", "init_dir"]


def _snapshot_files(path) -> list:
    """Expand a snapshot spec into the list of files it names: a single
    file, an explicit list, a glob pattern, or a directory of split
    snapshot parts (Gadget-4/Arepo ``snap_550.0.hdf5 .. .N.hdf5`` —
    the reference only read single files, ``interp.py:115``)."""
    import glob as _glob
    import os as _os

    if isinstance(path, (list, tuple)):
        files = [str(p) for p in path]
    elif _os.path.isdir(path):
        files = sorted(
            _glob.glob(_os.path.join(path, "*.hdf5"))
            + _glob.glob(_os.path.join(path, "*.h5"))
        )
    elif _os.path.exists(path):
        # an existing literal path wins even if it contains glob
        # metacharacters (e.g. run[1]/snap.hdf5)
        files = [str(path)]
    elif any(c in str(path) for c in "*?["):
        files = sorted(_glob.glob(str(path)))
    else:
        files = [str(path)]
    if not files:
        raise FileNotFoundError(f"no snapshot files match {path!r}")
    return files


def load_snapshot(
    path,
    box_size: float = 1.0,
    remove_bulk_velocity: bool = True,
    shift_to_origin: bool = True,
    dtype=jnp.float32,
    device: Optional[jax.Device] = None,
) -> Particles:
    """Read ``PartType0/{Coordinates,Masses,Density,Velocities}`` from an
    HDF5 snapshot (reference ``interp.py:115-129``).  ``path`` may also
    be a glob pattern, a directory, or a list of files — split
    snapshots are concatenated (particle order is irrelevant to every
    deposition).

    Bulk-velocity removal and the shift to the origin run on device.
    """
    import h5py  # deferred: keep import cost out of the jit path

    parts = {"Coordinates": [], "Masses": [], "Density": [],
             "Velocities": []}
    for fname in _snapshot_files(path):
        with h5py.File(fname, "r") as f:
            g = f["PartType0"]
            for key, acc in parts.items():
                acc.append(np.asarray(g[key][:], dtype=np.float32))
    cat = (lambda xs: xs[0] if len(xs) == 1 else np.concatenate(xs))
    pos = cat(parts["Coordinates"])
    mass = cat(parts["Masses"])
    density = cat(parts["Density"])
    vel = cat(parts["Velocities"])

    put = (lambda x: jax.device_put(x, device)) if device else jnp.asarray
    particles = Particles(
        pos=put(pos.astype(dtype)),
        mass=put(mass.astype(dtype)),
        density=put(density.astype(dtype)),
        vel=put(vel.astype(dtype)),
        box_size=float(box_size),
    )
    if remove_bulk_velocity:
        particles = particles.remove_bulk_velocity()
    if shift_to_origin:
        particles = particles.shift_to_origin()
    return particles


def save_snapshot(path: str, particles: Particles) -> None:
    """Write a Particles set back to the same HDF5 layout (round-trip
    support; the reference never writes snapshots)."""
    import h5py

    with h5py.File(path, "w") as f:
        g = f.create_group("PartType0")
        g.create_dataset("Coordinates", data=np.asarray(particles.pos))
        g.create_dataset("Masses", data=np.asarray(particles.mass))
        g.create_dataset("Density", data=np.asarray(particles.density))
        g.create_dataset("Velocities", data=np.asarray(particles.vel))
        f.attrs["box_size"] = particles.box_size


def init_dir(run_output_dir: str, auto_overwrite: bool = False) -> str:
    """Create (or confirm-overwrite) a run output folder — reference
    ``init_dir`` (``interp.py:56-79``), minus the interactive prompt when
    ``auto_overwrite`` is set."""
    if not os.path.exists(run_output_dir):
        os.makedirs(run_output_dir)
        return run_output_dir
    if auto_overwrite:
        shutil.rmtree(run_output_dir)
        os.makedirs(run_output_dir)
        return run_output_dir
    print("Warning: output folder already exists. Overwrite? (y/n): ", end="")
    if input() == "y":
        shutil.rmtree(run_output_dir)
        os.makedirs(run_output_dir)
        return run_output_dir
    raise SystemExit("Output folder exists and overwrite declined.")
