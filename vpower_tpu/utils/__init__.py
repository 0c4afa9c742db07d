from .checks import ConservationReport, check_conservation
from .plotting import (
    plot_density_slice,
    plot_velocity_slice,
    peek_field,
    plot_spectrum,
    peek_spectrum,
)

__all__ = [
    "ConservationReport", "check_conservation",
    "plot_density_slice", "plot_velocity_slice", "peek_field",
    "plot_spectrum", "peek_spectrum",
]
