from .mesh import make_mesh, mesh_shape_for
from .planner import Plan, plan_run
from .pipeline import distributed_spectrum, distributed_folded_sweep
from .deposit import deposit_ngp_local, deposit_cic_local, local_block_info

__all__ = [
    "make_mesh", "mesh_shape_for",
    "Plan", "plan_run",
    "distributed_spectrum", "distributed_folded_sweep",
    "deposit_ngp_local", "deposit_cic_local", "local_block_info",
]
