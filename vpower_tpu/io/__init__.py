from .bricks import BrickStore
from .snapshot import load_snapshot, save_snapshot, init_dir
from .synthetic import (
    gaussian_random_field,
    grid_positions,
    particles_from_field,
    synthetic_particles,
)

__all__ = [
    "BrickStore", "load_snapshot", "save_snapshot", "init_dir",
    "gaussian_random_field", "grid_positions",
    "particles_from_field", "synthetic_particles",
]
