from .gat import GAT, GATConv, xavier_normal
from .monet import GMMConv, MoNet
from .dgcnn import DGCNN, EdgeConv

__all__ = ["GAT", "GATConv", "xavier_normal", "GMMConv", "MoNet", "DGCNN",
           "EdgeConv"]
