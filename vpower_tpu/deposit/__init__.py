from .scatter import cell_index, deposit_ngp, deposit_cic, sort_by_cell

__all__ = ["cell_index", "deposit_ngp", "deposit_cic", "sort_by_cell"]
