from .build import add_self_loops, coo_to_csr, csr_to_csc_permute, remove_self_loops
from .binning import BinnedCSR, bin_csr, DEFAULT_WIDTHS
from .structure import BinnedAdj, Graph, build_graph, from_binned
from .knn import knn_graph

__all__ = [
    "add_self_loops",
    "coo_to_csr",
    "csr_to_csc_permute",
    "remove_self_loops",
    "BinnedCSR",
    "bin_csr",
    "DEFAULT_WIDTHS",
    "BinnedAdj",
    "Graph",
    "build_graph",
    "from_binned",
]
