"""Checkpoint persistence for fields and folded fields (.npz).

The reference pickled every intermediate (``FoldedBox.save/load``
``interp.py:794-810``, ``BrickInventory.save/load`` ``interp.py:949-961``,
spectrum pickles ``spctrm.py:224-245``) so long runs could resume; here
the same contract uses ``.npz`` (SURVEY.md §5 checkpoint/resume: "same
contract with .npz instead of pickle").  Spectrum persistence lives on
:class:`vpower_tpu.spectrum.PowerSpectrum`; brick persistence on
:class:`vpower_tpu.io.bricks.BrickStore`.
"""
from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

from ..core.field import BoxField, FoldedField

__all__ = ["save_field", "load_field", "save_folded", "load_folded"]


def save_field(path: str, field: BoxField) -> str:
    np.savez(
        path if path.endswith(".npz") else path + ".npz",
        velocity=np.asarray(field.velocity),
        mass=np.asarray(field.mass),
        cell_size=field.cell_size,
    )
    return path


def load_field(path: str) -> BoxField:
    with np.load(path if path.endswith(".npz") else path + ".npz") as z:
        return BoxField(
            velocity=jnp.asarray(z["velocity"]),
            mass=jnp.asarray(z["mass"]),
            cell_size=float(z["cell_size"]),
        )


def _folded_path(out_dir: str, beta) -> str:
    # Delimited, multi-digit-safe form of the reference scheme
    # folded_field_b{x}{y}{z}.pkl (interp.py:798), which collides for
    # fold factors m >= 10.
    return os.path.join(out_dir, "folded_field_b{}_{}_{}.npz".format(*beta))


def save_folded(out_dir: str, folded: FoldedField) -> str:
    path = _folded_path(out_dir, folded.beta)
    np.savez(
        path,
        field=np.asarray(folded.field),
        fold_factor=folded.fold_factor,
        beta=np.asarray(folded.beta),
        box_size=folded.box_size,
        total_box_size=folded.total_box_size,
    )
    return path


def load_folded(out_dir: str, beta) -> FoldedField:
    path = _folded_path(out_dir, beta)
    if not os.path.isfile(path):  # legacy single-digit scheme
        legacy = os.path.join(
            out_dir, "folded_field_b{}{}{}.npz".format(*beta)
        )
        if os.path.isfile(legacy):
            path = legacy
    with np.load(path) as z:
        return FoldedField(
            field=jnp.asarray(z["field"]),
            fold_factor=int(z["fold_factor"]),
            beta=tuple(int(b) for b in z["beta"]),
            box_size=float(z["box_size"]),
            total_box_size=float(z["total_box_size"]),
        )
