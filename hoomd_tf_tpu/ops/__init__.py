from .box import box_size, wrap_vector, make_box, box_from_lengths
from .numerics import (safe_norm, nlist_rinv, masked_nlist, divide_no_nan,
                       multiply_no_nan)
from .forces import compute_nlist_forces, compute_positions_forces
from .nlist import compute_nlist, nlist_from_positions
from .cell_list import CellList, cell_list_nlist
from .direct import NlistPlanes, direct_cell_planes
from .cellwise import Cellwise, CellwisePlan, plan_cellwise, cellwise_planes
from .rdf import compute_rdf

__all__ = [
    "box_size", "wrap_vector", "make_box", "box_from_lengths",
    "safe_norm", "nlist_rinv", "masked_nlist", "divide_no_nan",
    "multiply_no_nan",
    "compute_nlist_forces", "compute_positions_forces",
    "compute_nlist", "nlist_from_positions",
    "CellList", "cell_list_nlist",
    "NlistPlanes", "direct_cell_planes",
    "Cellwise", "CellwisePlan", "plan_cellwise", "cellwise_planes",
    "compute_rdf",
]
