"""vpower_tpu — TPU-native velocity / momentum / kinetic-energy power
spectra for astrophysical simulation snapshots.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference ``YujieH3/large-velocity-power-spectrum`` ("Vpower"): particle
-> voxel deposition (NN / NGP / CIC / SPH), 3-D FFT power grids,
spherical k-shell binning, the folding technique for extended dynamic
range, and a sharded multi-chip pipeline (mesh + pencil FFT) replacing
the reference's MPI scripts.

Quickstart (mirrors the reference docs, ``docs/source/getting_started.rst``)::

    import jax
    from vpower_tpu import load_snapshot, deposit, spectrum_from_field

    particles = load_snapshot("snapshot.hdf5", box_size=1.0)
    field = deposit(particles, n_grid=256, method="nn")
    spectrum = spectrum_from_field(field, quantity="velocity")
    spectrum.save_txt("Pk.txt")
"""

from .core.particles import Particles
from .core.field import BoxField, FoldedField
from .io.bricks import BrickStore
from .io.snapshot import load_snapshot, save_snapshot, init_dir
from .io.synthetic import (
    gaussian_random_field,
    grid_positions,
    particles_from_field,
    synthetic_particles,
)
from .run.pipeline import (
    deposit,
    power_spectrum,
    spectrum_from_field,
    folded_spectrum,
    folded_spectrum_sweep,
    fused_fold_spectrum,
    fused_fold_full_spectrum,
    cross_spectrum,
    spectrum_from_folded,
)
from .run.streamed import streamed_folded_spectrum, streamed_folded_sweep
from .spectrum.spectrum import (
    PowerSpectrum,
    SpectrumList,
    relative_diff,
    empty_spectrum_like,
    beta_half_space,
    init_beta_space,
    random_beta_sequence,
)
from .utils.checks import check_conservation

__version__ = "0.6.0"

__all__ = [
    "Particles",
    "BoxField",
    "FoldedField",
    "load_snapshot",
    "save_snapshot",
    "init_dir",
    "gaussian_random_field",
    "grid_positions",
    "particles_from_field",
    "synthetic_particles",
    "deposit",
    "power_spectrum",
    "spectrum_from_field",
    "folded_spectrum",
    "folded_spectrum_sweep",
    "fused_fold_spectrum",
    "fused_fold_full_spectrum",
    "cross_spectrum",
    "spectrum_from_folded",
    "streamed_folded_spectrum",
    "streamed_folded_sweep",
    "BrickStore",
    "PowerSpectrum",
    "SpectrumList",
    "relative_diff",
    "empty_spectrum_like",
    "beta_half_space",
    "init_beta_space",
    "random_beta_sequence",
    "check_conservation",
]
