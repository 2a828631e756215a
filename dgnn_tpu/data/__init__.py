from .synthetic import (
    synthetic_citation,
    synthetic_point_clouds,
    rmat_edges,
    CitationData,
)
from .loaders import load_citation_dataset, load_modelnet

__all__ = [
    "synthetic_citation",
    "synthetic_point_clouds",
    "rmat_edges",
    "CitationData",
    "load_citation_dataset",
    "load_modelnet",
]
