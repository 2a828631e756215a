"""GMMConv (MoNet) layer and network (flax.linen).

Semantics mirror the reference layer (dgNN/layers/gmmconv_layer.py) and MoNet
(script/train/train_gmmconv.py:11-59): per-layer pseudo-coordinate projection
Linear(2, dim) + tanh, Gaussian-mixture edge weighting fused with SpMM, sum
over kernels.  Init: fc xavier-normal(relu gain), mu ~ N(0, 0.1),
inv_sigma = 1 (gmmconv_layer.py:43-49).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..graph.structure import Graph
from ..ops.gmm import (NodePseudo, gmm_aggregate, gmm_aggregate_binned,
                       gmm_aggregate_node)
from .gat import xavier_normal


class GMMConv(nn.Module):
    """Gaussian-mixture model convolution. Output: [N, out_feats].

    ``pseudo`` is either flat [E, D] projected coords (general API) or the
    pre-binned raw tables from ``ops.gmm.bin_pseudo`` — the fast path, where
    the per-layer Linear+tanh projection runs inside the fused op
    (set ``pseudo_proj=True``; reference analogue: MoNet's pseudo_proj,
    train_gmmconv.py:38,48)."""

    out_feats: int
    dim: int
    n_kernels: int
    residual: bool = False
    use_bias: bool = True
    pseudo_proj: bool = False
    gather_dtype: object = None  # e.g. "bfloat16": halve gathered rows

    @nn.compact
    def __call__(self, graph: Graph, feat, pseudo, *, training: bool = False):
        k = self.n_kernels
        f = self.out_feats
        node_feat = nn.Dense(k * f, use_bias=False, kernel_init=xavier_normal(),
                             name="fc")(feat)
        node_feat = node_feat.reshape(-1, k, f)
        mu = self.param("mu", nn.initializers.normal(0.1), (k, self.dim))
        inv_sigma = self.param("inv_sigma", nn.initializers.ones, (k, self.dim))
        if isinstance(pseudo, NodePseudo):
            din = pseudo.src.shape[-1] + pseudo.dst.shape[-1]
            pw = self.param("pseudo_w", nn.initializers.lecun_normal(),
                            (din, self.dim))
            pb = self.param("pseudo_b", nn.initializers.zeros, (self.dim,))
            gd = (jnp.dtype(self.gather_dtype)
                  if self.gather_dtype is not None else None)
            rst = gmm_aggregate_node(graph, node_feat, pseudo.src, pseudo.dst,
                                     mu, inv_sigma, proj_weight=pw,
                                     proj_bias=pb, use_tanh=True,
                                     gather_dtype=gd)
        elif isinstance(pseudo, tuple):
            if self.pseudo_proj:
                din = pseudo[0][0].shape[-1]
                pw = self.param("pseudo_w", nn.initializers.lecun_normal(),
                                (din, self.dim))
                pb = self.param("pseudo_b", nn.initializers.zeros, (self.dim,))
                rst = gmm_aggregate_binned(graph, node_feat, pseudo, mu,
                                           inv_sigma, proj_weight=pw,
                                           proj_bias=pb, use_tanh=True)
            else:
                rst = gmm_aggregate_binned(graph, node_feat, pseudo, mu,
                                           inv_sigma)
        else:
            rst = gmm_aggregate(graph, node_feat, pseudo, mu, inv_sigma)
        rst = jnp.sum(rst, axis=1)  # sum over kernels (gmmconv_layer.py:58)
        if self.residual:
            if feat.shape[-1] != f:
                res = nn.Dense(f, use_bias=False, kernel_init=xavier_normal(),
                               name="res_fc")(feat)
            else:
                res = feat
            rst = rst + res
        if self.use_bias:
            rst = rst + self.param("bias", nn.initializers.zeros, (f,))
        return rst


class MoNet(nn.Module):
    """MoNet stack with per-layer pseudo projections and inter-layer dropout
    (reference MoNet.forward, train_gmmconv.py:52-59)."""

    n_hidden: int
    out_feats: int
    n_layers: int
    dim: int
    n_kernels: int
    dropout: float = 0.5
    gather_dtype: object = None

    @nn.compact
    def __call__(self, graph: Graph, feat, pseudo, *, training: bool = False):
        dims = [self.n_hidden] * self.n_layers + [self.out_feats]
        node_mode = isinstance(pseudo, NodePseudo)
        binned = isinstance(pseudo, tuple) and not node_mode
        h = feat
        for i, out in enumerate(dims):
            if i != 0 and self.dropout > 0.0:
                h = nn.Dropout(self.dropout)(h, deterministic=not training)
            if node_mode:
                # node-derived pseudo: projection + Gaussian + SpMM all
                # inside the fused op; enables the dense hub-block path
                h = GMMConv(out_feats=out, dim=self.dim,
                            n_kernels=self.n_kernels,
                            gather_dtype=self.gather_dtype,
                            name=f"gmm_{i}")(graph, h, pseudo,
                                             training=training)
            elif binned:
                # fast path: raw tables stream through the fused op; the
                # per-layer Linear+tanh projection runs inside it
                h = GMMConv(out_feats=out, dim=self.dim,
                            n_kernels=self.n_kernels, pseudo_proj=True,
                            name=f"gmm_{i}")(graph, h, pseudo,
                                             training=training)
            else:
                p = nn.tanh(nn.Dense(self.dim, name=f"pseudo_proj_{i}")(pseudo))
                h = GMMConv(out_feats=out, dim=self.dim,
                            n_kernels=self.n_kernels,
                            name=f"gmm_{i}")(graph, h, p, training=training)
        return h
