"""Pallas fused GAT forward kernel vs the XLA reference path (interpret mode
on CPU; the same kernel compiles with Mosaic on TPU)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgnn_tpu.graph.structure import build_graph
from dgnn_tpu.ops import reference
from dgnn_tpu.ops.gat import (_concat_rows, _forward_bin,
                               _forward_bin_pallas, gat_aggregate)
from tests.conftest import random_graph


def _setup(rng, n=64, deg=6, h=8, f=128, widths=(16,)):
    src, dst = random_graph(rng, n, deg)
    g = build_graph(src, dst, n, widths=widths)
    ar = jnp.asarray(rng.normal(size=(n, h)), jnp.float32)
    ac = jnp.asarray(rng.normal(size=(n, h)), jnp.float32)
    feat = jnp.asarray(rng.normal(size=(n, h, f)), jnp.float32)
    return g, ar, ac, feat


def test_pallas_fwd_bin_matches_xla(rng):
    g, ar, ac, feat = _setup(rng)
    seed = jnp.uint32(0)
    for width, nbr, edge, row, count in g.fwd.bins():
        xcat = _concat_rows(feat, ac)
        m0, l0, lp0, acc0, accp0 = _forward_bin(
            width, nbr, edge, row, count, ar, ac, feat, xcat, 0.2, 0.0, seed,
            False)
        m1, l1, lp1, acc1, accp1 = _forward_bin_pallas(
            width, nbr, edge, row, count, ar, ac, feat, 0.2, 0.0, seed, False)
        np.testing.assert_allclose(m1, m0, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(l1, l0, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(lp1, lp0, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(acc1, acc0, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(accp1, accp0, rtol=1e-5, atol=1e-5)


def test_pallas_fwd_bin_with_dropout(rng):
    g, ar, ac, feat = _setup(rng, h=16, f=128)
    seed = jnp.uint32(1234)
    for width, nbr, edge, row, count in g.fwd.bins():
        xcat = _concat_rows(feat, ac)
        m0, l0, lp0, acc0, accp0 = _forward_bin(
            width, nbr, edge, row, count, ar, ac, feat, xcat, 0.2, 0.4, seed,
            True)
        m1, l1, lp1, acc1, accp1 = _forward_bin_pallas(
            width, nbr, edge, row, count, ar, ac, feat, 0.2, 0.4, seed, True)
        np.testing.assert_allclose(m1, m0, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(l1, l0, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(lp1, lp0, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(acc1, acc0, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(accp1, accp0, rtol=1e-5, atol=1e-5)


def test_pallas_backward_matches_dense(rng):
    """Full custom_vjp with Pallas kernels forced on (fwd + dX + SDDMM)."""
    g, ar, ac, feat = _setup(rng, n=64, deg=5, h=8, f=128, widths=(8,))
    adj = reference.dense_adj(np.asarray(g.row_ptr), np.asarray(g.col_ind),
                              g.num_nodes)

    def loss_fused(ar, ac, feat):
        return jnp.sum(jnp.sin(gat_aggregate(g, ar, ac, feat)))

    def loss_dense(ar, ac, feat):
        out, _, _ = reference.gat_dense(adj, ar, ac, feat, 0.2)
        return jnp.sum(jnp.sin(out))

    os.environ["DGNN_TPU_PALLAS"] = "1"
    try:
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(ar, ac, feat)
    finally:
        os.environ["DGNN_TPU_PALLAS"] = "0"
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(ar, ac, feat)
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_pallas_full_aggregate_forced(rng):
    """End-to-end gat_aggregate with the Pallas path forced on (interpret)."""
    g, ar, ac, feat = _setup(rng, n=80, deg=5, h=8, f=128, widths=(8, 32))
    adj = reference.dense_adj(np.asarray(g.row_ptr), np.asarray(g.col_ind),
                              g.num_nodes)
    os.environ["DGNN_TPU_PALLAS"] = "1"
    try:
        out = gat_aggregate(g, ar, ac, feat)
    finally:
        os.environ["DGNN_TPU_PALLAS"] = "0"
    ref, _, _ = reference.gat_dense(adj, ar, ac, feat, 0.2)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
