"""GAT layer and network (flax.linen).

Semantics mirror the reference layer (dgNN/layers/gatconv_layer.py) and
multi-layer Net (script/train/train_gatconv.py:11-53): dense projection and
attention-coefficient reduction in plain matmuls (MXU), everything sparse in
the fused `gat_aggregate` op.  Init follows the reference's xavier-normal
with relu gain (gatconv_layer.py:58-66).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..graph.structure import Graph
from ..ops.gat import gat_aggregate
from ..ops.naive import gat_naive

_GAIN_RELU = float(np.sqrt(2.0))


def xavier_normal(gain: float = _GAIN_RELU):
    return nn.initializers.variance_scaling(gain * gain, "fan_avg", "normal")


class GATConv(nn.Module):
    """Multi-head graph attention layer over a fused sparse aggregation.

    Output: [N, num_heads, out_feats].
    """

    out_feats: int
    num_heads: int
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    negative_slope: float = 0.2
    residual: bool = False
    activation: Optional[Callable] = None
    use_bias: bool = True
    impl: str = "fused"  # "fused" (binned/Pallas) | "naive" (DGL-style)
    gather_dtype: Optional[str] = None  # e.g. "bfloat16": halve gathered rows

    @nn.compact
    def __call__(self, graph: Graph, feat, *, training: bool = False):
        h = self.num_heads
        f = self.out_feats
        init = xavier_normal()
        x = nn.Dense(h * f, use_bias=False, kernel_init=init, name="W")(feat)
        x = x.reshape(-1, h, f)
        if self.feat_drop > 0.0:
            x = nn.Dropout(self.feat_drop)(x, deterministic=not training)
        attn_l = self.param("attn_l", init, (1, h, f))
        attn_r = self.param("attn_r", init, (1, h, f))
        attn_row = jnp.sum(attn_l * x, axis=-1)  # [N, H] dst coefficients
        attn_col = jnp.sum(attn_r * x, axis=-1)  # [N, H] src coefficients
        key = None
        if training and self.attn_drop > 0.0:
            key = self.make_rng("dropout")
        agg = gat_naive if self.impl == "naive" else gat_aggregate
        kw = {}
        if self.gather_dtype is not None and self.impl == "fused":
            kw["gather_dtype"] = jnp.dtype(self.gather_dtype)
        rst = agg(graph, attn_row, attn_col, x,
                  negative_slope=self.negative_slope,
                  attn_drop=self.attn_drop, key=key, training=training, **kw)
        if self.residual:
            if feat.shape[-1] != h * f:
                res = nn.Dense(h * f, use_bias=False, kernel_init=init,
                               name="res_fc")(feat)
            else:
                res = feat
            rst = rst + res.reshape(-1, h, f)
        if self.use_bias:
            rst = rst + self.param("bias", nn.initializers.zeros, (1, h, f))
        if self.activation is not None:
            rst = self.activation(rst)
        return rst


class GAT(nn.Module):
    """Multi-layer GAT: `num_layers` hidden layers with `heads[l]` heads whose
    outputs are flattened, then an output layer averaged over its heads
    (reference Net.forward, train_gatconv.py:47-53)."""

    num_layers: int
    n_hidden: int
    n_classes: int
    heads: Sequence[int]
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    negative_slope: float = 0.2
    residual: bool = False
    activation: Optional[Callable] = None
    impl: str = "fused"
    gather_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, graph: Graph, feat, *, training: bool = False):
        h = feat
        for layer in range(self.num_layers):
            h = GATConv(
                out_feats=self.n_hidden,
                num_heads=self.heads[layer],
                feat_drop=self.feat_drop,
                attn_drop=self.attn_drop,
                negative_slope=self.negative_slope,
                residual=self.residual,
                activation=self.activation,
                use_bias=layer > 0,  # reference: input projection bias=False
                impl=self.impl,
                gather_dtype=self.gather_dtype,
                name=f"gat_{layer}",
            )(graph, h, training=training)
            h = h.reshape(h.shape[0], -1)
        logits = GATConv(
            out_feats=self.n_classes,
            num_heads=self.heads[-1],
            feat_drop=self.feat_drop,
            attn_drop=self.attn_drop,
            negative_slope=self.negative_slope,
            impl=self.impl,
            gather_dtype=self.gather_dtype,
            name="gat_out",
        )(graph, h, training=training)
        return jnp.mean(logits, axis=1)
