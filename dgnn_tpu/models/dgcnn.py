"""EdgeConv layer and DGCNN point-cloud classifier (flax.linen).

Semantics mirror the reference layer (dgNN/layers/edgeconv_layer.py) and
Model (script/train/train_edgeconv.py:12-70): the k-NN graph is rebuilt from
features before every EdgeConv (here fully on device, graph/knn.py), layer
outputs are concatenated, projected, max+mean pooled, then an MLP head.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph.knn import knn_graph, knn_mask_neg
from ..ops.edgeconv import edge_conv_max, edge_conv_max_dense


class EdgeConv(nn.Module):
    """theta/phi formulation: out[i] = max_j (phi(x_i) + theta(x_j - x_i)),
    computed as max_j(h_dst[i] + h_src[j]) with h_src = theta(x),
    h_dst = phi(x) - theta(x) (edgeconv_layer.py:34-41).

    ``adj`` is either an explicit [N, k] neighbor-id table (gather path,
    reference-API parity) or a dense [B, P, P] additive mask with [B, P, C]
    features (the TPU performance path — see ops/edgeconv.py)."""

    out_feat: int
    batch_norm: bool = False

    @nn.compact
    def __call__(self, adj, feat, *, training: bool = False):
        h_theta = nn.Dense(self.out_feat, use_bias=False, name="theta")(feat)
        h_phi = nn.Dense(self.out_feat, use_bias=False, name="phi")(feat)
        if adj.ndim == 3:
            out = edge_conv_max_dense(adj, h_theta, h_phi - h_theta)
        else:
            out = edge_conv_max(adj, h_theta, h_phi - h_theta)
        if self.batch_norm:
            out = nn.BatchNorm(use_running_average=not training)(out)
        return out


class DGCNN(nn.Module):
    """Dynamic graph CNN for point-cloud classification (reference Model,
    train_edgeconv.py:12-70; defaults from :243)."""

    k: int = 40
    feature_dims: Sequence[int] = (64, 64, 128, 256)
    emb_dims: Sequence[int] = (512, 512, 256)
    output_classes: int = 40
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        b, p, _ = x.shape
        hs = []
        h = x
        for i, dim in enumerate(self.feature_dims):
            # dynamic graph from current features, as a dense per-cloud mask;
            # graph construction is not differentiated (reference likewise),
            # and stop_gradient keeps AD from building a backward path
            # through the top_k / distance matrix
            mask = jax.lax.stop_gradient(knn_mask_neg(h, self.k))
            h = EdgeConv(dim, name=f"conv_{i}")(mask, h, training=training)
            h = nn.leaky_relu(h, negative_slope=0.2)
            hs.append(h)
        h = jnp.concatenate(hs, axis=-1)
        h = nn.Dense(self.emb_dims[0], name="proj")(h)
        h_max = jnp.max(h, axis=1)
        h_avg = jnp.mean(h, axis=1)
        h = jnp.concatenate([h_max, h_avg], axis=-1)
        for i in range(1, len(self.emb_dims)):
            h = nn.Dense(self.emb_dims[i], name=f"emb_{i}")(h)
            h = nn.BatchNorm(use_running_average=not training,
                             name=f"bn_{i}")(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
            if self.dropout > 0.0:
                h = nn.Dropout(self.dropout)(h, deterministic=not training)
        return nn.Dense(self.output_classes, name="head")(h)
