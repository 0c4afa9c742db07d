from .scatter import cell_index, deposit_ngp, deposit_cic, sort_by_cell
from .nn import nn_assign, nn_brute_force, nn_interp_to_field
from .nn_window import nn_exact_assign, nn_window_gather
from .sph import sph_deposit, sph_interp_to_field, kernel_weight

__all__ = [
    "cell_index", "deposit_ngp", "deposit_cic", "sort_by_cell",
    "nn_assign", "nn_brute_force", "nn_interp_to_field",
    "nn_exact_assign", "nn_window_gather",
    "sph_deposit", "sph_interp_to_field", "kernel_weight",
]
