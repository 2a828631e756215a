"""SPMD execution of row-partitioned GNN layers under `shard_map`.

The communication design (SURVEY.md §2.6 "TPU-build disposition"): node
features live sharded by row range over the mesh axis; each layer sends
exactly the statically-planned boundary rows with ONE `lax.all_to_all` over
ICI, and local-source edges aggregate in parallel with the collective —
XLA's scheduler overlaps them because the local bin set has no data
dependency on the received halo.  Gradients flow back through the collective
automatically (all_to_all transposes to the reverse all_to_all), so remote
feature gradients return to their owning shard with no hand-written
reduction.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..graph.structure import BinnedAdj
from ..models.gat import xavier_normal
from ..ops.gat import _gat_fused
from ..ops.gmm import NodePseudo, _gmm2, _gmm_node
from .partition import GraphShards

__all__ = ["local_view", "halo_exchange", "merge_binned", "shard_edge_data",
           "ShardedGATConv", "ShardedGAT", "ShardedGMMConv", "ShardedMoNet"]


def local_view(shards: GraphShards) -> GraphShards:
    """Strip the leading (sharded) axis inside shard_map blocks."""
    return jax.tree.map(lambda x: x[0], shards)


def merge_binned(a: BinnedAdj, b: BinnedAdj, cmb=None, dense=None) -> BinnedAdj:
    """Union of two bin sets over the same destination rows (local + halo
    edge partitions combine through the segment log-sum-exp merge).

    ``cmb``/``dense``: the shard's precomputed combine table and dense hub
    block (partition.GraphShards.fwd_cmb/fwd_dense) — the cmb's positions
    cover a's bins ++ b's bins ++ dense rows, exactly this merged adjacency's
    partial order, so the fused ops run their fast scatter-free + MXU path."""
    assert a.num_rows == b.num_rows
    return BinnedAdj(nbr=a.nbr + b.nbr, edge=a.edge + b.edge, row=a.row + b.row,
                     count=a.count + b.count, cmb=cmb, dense=dense, epos=None,
                     widths=a.widths + b.widths, num_rows=a.num_rows,
                     num_edges=a.num_edges + b.num_edges)


def halo_exchange(x_local: jax.Array, send_ids: jax.Array, axis_name: str):
    """Exchange boundary rows: returns [C + P*Hmax, D] extended features.

    x_local: [C, D] this shard's rows; send_ids: [P, Hmax] local indices to
    send to each peer.  recv[q] arrives in exactly the requesting shard's
    halo-slot order (partition.py builds both sides from the same sorted
    request list), so extended index C + q*Hmax + j is recv[q, j].
    """
    send = x_local[send_ids]  # [P, Hmax, D]
    recv = jax.lax.all_to_all(send, axis_name, split_axis=0, concat_axis=0)
    return jnp.concatenate([x_local, recv.reshape(-1, x_local.shape[-1])], 0)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def psum_grad(x, axis_name):
    """Identity whose transpose is a cross-shard psum.

    Wrap replicated parameters consumed inside a custom_vjp op: the op's
    backward emits shard-local partial parameter gradients, and this makes
    the cross-shard reduction explicit (shard_map cannot infer it through a
    custom_vjp)."""
    return x


def _psum_grad_fwd(x, axis_name):
    return x, None


def _psum_grad_bwd(axis_name, _, g):
    # Under check_vma=True the cotangent carries vma={axis}: shard_map will
    # NOT reduce it for a replicated input unless we psum here (making it
    # replicated).  Under check_vma=False vma tracking is off (vma == {})
    # and shard_map's transpose ALWAYS psums replicated-input cotangents —
    # psumming here too would multiply the gradient by the axis size.
    if axis_name in jax.typeof(g).vma:
        return (jax.lax.psum(g, axis_name),)
    return (g,)


psum_grad.defvjp(_psum_grad_fwd, _psum_grad_bwd)


def shard_edge_data(shards: GraphShards, data):
    """Reshard flat per-edge data [E, ...] (global CSR edge order) into each
    shard's binned slot tables, stacked on the shard axis.

    Returns (fwd_local_tables, fwd_halo_tables, bwd_tables) — tuples of
    [P, S, W, ...] arrays matching the shard's bin structure (strip the shard
    axis with local_view inside shard_map, like the rest of GraphShards).
    """
    local_flat = data[shards.edge_gids]  # [P, Emax, ...]
    take = jax.vmap(lambda lf, e: lf[e])

    def tables(adj: BinnedAdj):
        return tuple(take(local_flat, e) for e in adj.edge)

    return (tables(shards.fwd_local), tables(shards.fwd_halo),
            tables(shards.bwd))


class ShardedGATConv(nn.Module):
    """GATConv over one graph shard (run under shard_map).

    Per layer: local dense projection -> one all_to_all of (features ++
    attn_col) boundary rows -> fused aggregation where local-source bins
    overlap the collective.
    """

    out_feats: int
    num_heads: int
    axis_name: str = "graph"
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    negative_slope: float = 0.2
    residual: bool = False
    use_bias: bool = True
    dense_dtype: str = "bfloat16"  # MXU input dtype of the dense hub block

    @nn.compact
    def __call__(self, local: GraphShards, feat, *, training: bool = False):
        h = self.num_heads
        f = self.out_feats
        init = xavier_normal()
        x = nn.Dense(h * f, use_bias=False, kernel_init=init, name="W")(feat)
        x = x.reshape(-1, h, f)
        if self.feat_drop > 0.0:
            x = nn.Dropout(self.feat_drop)(x, deterministic=not training)
        attn_l = self.param("attn_l", init, (1, h, f))
        attn_r = self.param("attn_r", init, (1, h, f))
        attn_row = jnp.sum(attn_l * x, axis=-1)  # [C, H] local dst rows
        attn_col = jnp.sum(attn_r * x, axis=-1)  # [C, H] local src rows

        # one collective for features + source coefficients
        payload = jnp.concatenate([x.reshape(-1, h * f), attn_col], axis=-1)
        ext = halo_exchange(payload, local.send_ids, self.axis_name)
        feat_ext = ext[:, : h * f].reshape(-1, h, f)
        ac_ext = ext[:, h * f:]

        if training and self.attn_drop > 0.0:
            # same seed on every shard; pair_keep keys on GLOBAL ids
            # (ext_gids), so the sharded mask is bit-identical to single-chip
            seed = jax.random.bits(self.make_rng("dropout"), dtype=jnp.uint32)
        else:
            seed = jnp.uint32(0)
        adj_fwd = merge_binned(local.fwd_local, local.fwd_halo,
                               cmb=local.fwd_cmb, dense=local.fwd_dense)
        adj_bwd = dataclasses.replace(local.bwd, cmb=local.bwd_cmb,
                                      dense=local.bwd_dense)
        rst = _gat_fused(self.negative_slope, float(self.attn_drop),
                         bool(training), self.dense_dtype, adj_fwd, adj_bwd,
                         attn_row, ac_ext, feat_ext, seed, local.ext_gids)
        if self.residual:
            res = x if feat.shape[-1] == h * f else nn.Dense(
                h * f, use_bias=False, kernel_init=init, name="res_fc")(feat).reshape(-1, h, f)
            rst = rst + res
        if self.use_bias:
            rst = rst + self.param("bias", nn.initializers.zeros, (1, h, f))
        return rst


class ShardedGMMConv(nn.Module):
    """GMMConv over one graph shard (run under shard_map).

    Same communication shape as ShardedGATConv: local dense projection, ONE
    all_to_all of boundary rows, fused Gaussian-weighted aggregation over
    merged local+halo bins.  Two pseudo modes, mirroring models.GMMConv:

    - ``NodePseudo``: node-derived pseudo coordinates (the reference's
      citation protocol).  The source-side scalars ride the halo payload
      with the features (like attn_col in ShardedGATConv) so the projected
      alpha/beta are derivable per shard, which keeps the edge weight
      separable — this mode runs the full dense-hub MXU path + combine
      tables (ops/gmm.gmm_aggregate_node).
    - pseudo tables from ``shard_edge_data``: per-edge pseudo streams with
      the bins; no per-edge exchange is ever needed because edge data is
      owned by the destination shard (no dense kernel in this mode).
    """

    out_feats: int
    dim: int
    n_kernels: int
    axis_name: str = "graph"
    use_bias: bool = True
    dense_dtype: str = "bfloat16"  # MXU input dtype of the dense hub block

    @nn.compact
    def __call__(self, local: GraphShards, feat, pseudo, *,
                 training: bool = False):
        k = self.n_kernels
        f = self.out_feats
        node_feat = nn.Dense(k * f, use_bias=False, kernel_init=xavier_normal(),
                             name="fc")(feat)
        mu = self.param("mu", nn.initializers.normal(0.1), (k, self.dim))
        inv_sigma = self.param("inv_sigma", nn.initializers.ones,
                               (k, self.dim))
        if isinstance(pseudo, NodePseudo):
            # node-pseudo mode: pseudo.src/[C, Ds] and pseudo.dst [C, Dd] are
            # shard-local per-node scalars; source scalars join the halo
            # payload so every extended source row carries its own.
            ds = pseudo.src.shape[-1]
            pw = self.param("pseudo_w", nn.initializers.lecun_normal(),
                            (ds + pseudo.dst.shape[-1], self.dim))
            pbias = self.param("pseudo_b", nn.initializers.zeros, (self.dim,))
            payload = jnp.concatenate(
                [node_feat, pseudo.src.astype(node_feat.dtype)], axis=-1)
            ext = halo_exchange(payload, local.send_ids, self.axis_name)
            feat_ext = ext[:, : k * f].reshape(-1, k, f)
            sfeat_ext = ext[:, k * f:].astype(jnp.float32)
            adj_fwd = merge_binned(local.fwd_local, local.fwd_halo,
                                   cmb=local.fwd_cmb, dense=local.fwd_dense)
            adj_bwd = dataclasses.replace(local.bwd, cmb=local.bwd_cmb,
                                          dense=local.bwd_dense)
            # _gmm_node's backward emits shard-local partials for these
            pw, pbias, mu, inv_sigma = (psum_grad(v, self.axis_name)
                                        for v in (pw, pbias, mu, inv_sigma))
            rst = _gmm_node(True, self.dense_dtype, adj_fwd, adj_bwd,
                            sfeat_ext, pseudo.dst.astype(jnp.float32),
                            feat_ext, pw[:ds], pw[ds:], pbias, mu, inv_sigma)
        else:
            feat_ext = halo_exchange(node_feat, local.send_ids,
                                     self.axis_name).reshape(-1, k, f)
            pf_l, pf_h, pb = pseudo
            din = pf_l[0].shape[-1]
            pw = self.param("pseudo_w", nn.initializers.lecun_normal(),
                            (din, self.dim))
            pbias = self.param("pseudo_b", nn.initializers.zeros,
                               (self.dim,))
            # per-edge-pseudo GMM has no dense-hub kernel, so the combine
            # tables apply only when the shards were partitioned with
            # dense=None (a dense-built cmb indexes dense partials _gmm2
            # never produces)
            fcmb = local.fwd_cmb if local.fwd_dense is None else None
            bcmb = local.bwd_cmb if local.bwd_dense is None else None
            adj_fwd = merge_binned(local.fwd_local, local.fwd_halo, cmb=fcmb)
            adj_bwd = dataclasses.replace(local.bwd, cmb=bcmb, dense=None)
            # _gmm2's backward emits shard-local partials for these params
            pw, pbias, mu, inv_sigma = (psum_grad(v, self.axis_name)
                                        for v in (pw, pbias, mu, inv_sigma))
            rst = _gmm2(True, adj_fwd, adj_bwd, pf_l + pf_h, pb, feat_ext,
                        pw, pbias, mu, inv_sigma)
        rst = jnp.sum(rst, axis=1)
        if self.use_bias:
            rst = rst + self.param("bias", nn.initializers.zeros, (f,))
        return rst


class ShardedMoNet(nn.Module):
    """Multi-layer sharded MoNet with the same topology as models.MoNet."""

    n_hidden: int
    out_feats: int
    n_layers: int
    dim: int
    n_kernels: int
    axis_name: str = "graph"
    dropout: float = 0.5
    dense_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, local: GraphShards, feat, pseudo, *,
                 training: bool = False):
        dims = [self.n_hidden] * self.n_layers + [self.out_feats]
        h = feat
        for i, out in enumerate(dims):
            if i != 0 and self.dropout > 0.0:
                h = nn.Dropout(self.dropout)(h, deterministic=not training)
            h = ShardedGMMConv(out_feats=out, dim=self.dim,
                               n_kernels=self.n_kernels,
                               axis_name=self.axis_name,
                               dense_dtype=self.dense_dtype,
                               name=f"gmm_{i}")(local, h, pseudo,
                                                training=training)
        return h


class ShardedGAT(nn.Module):
    """Multi-layer sharded GAT with the same topology as models.GAT."""

    num_layers: int
    n_hidden: int
    n_classes: int
    heads: tuple
    axis_name: str = "graph"
    feat_drop: float = 0.0
    attn_drop: float = 0.0
    negative_slope: float = 0.2
    dense_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, local: GraphShards, feat, *, training: bool = False):
        h = feat
        for layer in range(self.num_layers):
            # layer names match models.GAT so parameter trees are
            # interchangeable between single-chip and sharded execution
            h = ShardedGATConv(out_feats=self.n_hidden,
                               num_heads=self.heads[layer],
                               axis_name=self.axis_name,
                               feat_drop=self.feat_drop,
                               attn_drop=self.attn_drop,
                               negative_slope=self.negative_slope,
                               dense_dtype=self.dense_dtype,
                               use_bias=layer > 0,
                               name=f"gat_{layer}")(local, h, training=training)
            h = h.reshape(h.shape[0], -1)
        logits = ShardedGATConv(out_feats=self.n_classes,
                                num_heads=self.heads[-1],
                                axis_name=self.axis_name,
                                feat_drop=self.feat_drop,
                                attn_drop=self.attn_drop,
                                negative_slope=self.negative_slope,
                                dense_dtype=self.dense_dtype,
                                name="gat_out")(local, h, training=training)
        return jnp.mean(logits, axis=1)
