from .gat import gat_aggregate
from .gmm import gmm_aggregate, gaussian_weights
from .edgeconv import edge_conv_max
from .primitives import edge_softmax, edge_transpose, sddmm, spmm
from . import reference
from . import common

__all__ = ["gat_aggregate", "gmm_aggregate", "gaussian_weights",
           "edge_conv_max", "edge_softmax", "edge_transpose", "sddmm",
           "spmm", "reference", "common"]
