"""Fused EdgeConv: per-channel neighbor max over fixed-degree k-NN graphs.

TPU-native re-design of the reference's `fused_edgeconv` module
(fused_edgeconv_kernel.cu:7-49 forward, :76-86 backward).  The graph is an
implicit fixed-degree edge list: node i's neighbors are ``nbr[i, 0:k]``.

    out[i, f] = max_j (h_dst[i, f] + h_src[nbr[i, j], f])

Backward scatters grad_out to the argmax source — the reference does this
with an atomicAdd racing against a same-launch zero-init (a real cross-block
race, SURVEY.md §2.3); here it is a deterministic XLA scatter-add over saved
argmax positions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .common import chunk_rows_for_budget, float0_like, scan_chunked

__all__ = ["edge_conv_max"]


def _fwd_compute(nbr, h_src, h_dst):
    k = nbr.shape[1]
    F = h_src.shape[-1]
    chunk = chunk_rows_for_budget(k, F)

    def fn(nbr_c, h_dst_c):
        vals = h_dst_c[:, None, :] + h_src[nbr_c]  # [S, k, F]
        kstar = jnp.argmax(vals, axis=1).astype(jnp.int32)  # [S, F]
        out = jnp.max(vals, axis=1)
        return (out, kstar), ()

    (out, kstar), _ = scan_chunked(fn, (nbr, h_dst), nbr.shape[0], chunk, ())
    return out, kstar


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ec(num_src, nbr, h_src, h_dst):
    out, _ = _fwd_compute(nbr, h_src, h_dst)
    return out


def _ec_fwd(num_src, nbr, h_src, h_dst):
    out, kstar = _fwd_compute(nbr, h_src, h_dst)
    # Residuals: argmax slot per (node, channel) only — the reference likewise
    # saves just max_idx (operators/fused_edgeconv.py:20).
    return out, (nbr, kstar)


def _ec_bwd(num_src, res, g):
    nbr, kstar = res
    n, f = g.shape
    node_star = jnp.take_along_axis(nbr, kstar, axis=1)  # [N, F] argmax source id
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, f), 1)
    d_src = jnp.zeros((num_src, f), g.dtype).at[node_star, cols].add(g)
    # d/d h_dst is the identity (h_dst[i, f] appears in every candidate;
    # reference returns grad_out directly, operators/fused_edgeconv.py:22)
    return (float0_like(nbr), d_src, g)


_ec.defvjp(_ec_fwd, _ec_bwd)


def edge_conv_max(nbr, h_src, h_dst):
    """out[i, f] = max over j in nbr[i] of (h_dst[i, f] + h_src[j, f]).

    Reference API analogue: EdgeConvFuse (operators/fused_edgeconv.py:8).

    Args:
      nbr: [N, k] int32 neighbor ids (k-NN list; typically includes i itself).
      h_src: [M, F] source-side features.
      h_dst: [N, F] destination-side features.
    """
    return _ec(h_src.shape[0], nbr, h_src, h_dst)
