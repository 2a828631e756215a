"""Dense hub-block path (graph/hub.py + ops/pallas_dense.py) vs oracle.

The dense path routes high-degree rows through bit-masked Pallas matmul
kernels; these tests force a dense block on small random graphs (interpret
mode on CPU) and check exact parity with the dense oracle and with the
all-binned build of the same graph.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgnn_tpu.graph import hub
from dgnn_tpu.graph.structure import build_graph
from dgnn_tpu.ops import reference
from dgnn_tpu.ops.gat import gat_aggregate
from tests.conftest import random_graph


def _setup(rng, n=40, deg=6, h=2, f=4, r=16, c=24):
    src, dst = random_graph(rng, n, deg, power_law=True)
    g_dense = build_graph(src, dst, n, widths=(4, 16), dense=(r, c))
    g_plain = build_graph(src, dst, n, widths=(4, 16))
    ar = jnp.asarray(rng.normal(size=(n, h)), jnp.float32)
    ac = jnp.asarray(rng.normal(size=(n, h)), jnp.float32)
    feat = jnp.asarray(rng.normal(size=(n, h, f)), jnp.float32)
    adj = reference.dense_adj(np.asarray(g_plain.row_ptr),
                              np.asarray(g_plain.col_ind), n)
    return g_dense, g_plain, ar, ac, feat, adj


def test_dense_block_built(rng):
    g_dense, g_plain, *_ = _setup(rng)
    assert g_dense.fwd.dense is not None
    assert g_dense.bwd.dense is not None
    # residual bins + dense block partition the edge set
    assert g_dense.fwd.num_edges < g_plain.fwd.num_edges
    assert g_dense.num_edges == g_plain.num_edges


def test_pack_mask_roundtrip(rng):
    from dgnn_tpu.ops.pallas_dense import DENSE_CT, unpack_mask

    mask01 = rng.random((8, 2 * DENSE_CT)) < 0.1
    bits = hub.pack_mask_bits(mask01)
    # unpack per tile and compare
    for t in range(2):
        tile_bits = jnp.asarray(bits[:, t * DENSE_CT // 8:
                                     (t + 1) * DENSE_CT // 8])
        got = np.asarray(unpack_mask(tile_bits))
        np.testing.assert_array_equal(
            got, mask01[:, t * DENSE_CT:(t + 1) * DENSE_CT].astype(np.int32))


def test_dense_forward_matches_oracle(rng):
    g_dense, _, ar, ac, feat, adj = _setup(rng)
    out = gat_aggregate(g_dense, ar, ac, feat, dense_dtype="float32")
    ref, _, _ = reference.gat_dense(adj, ar, ac, feat, 0.2)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_dense_forward_matches_binned(rng):
    g_dense, g_plain, ar, ac, feat, _ = _setup(rng)
    out_d = gat_aggregate(g_dense, ar, ac, feat, dense_dtype="float32")
    out_p = gat_aggregate(g_plain, ar, ac, feat)
    np.testing.assert_allclose(out_d, out_p, rtol=1e-4, atol=1e-5)


def test_dense_grads_match_oracle(rng):
    g_dense, _, ar, ac, feat, adj = _setup(rng, n=30, deg=5, r=8, c=16)

    def loss_fused(ar, ac, feat):
        out = gat_aggregate(g_dense, ar, ac, feat, dense_dtype="float32",
                            training=True)
        return jnp.sum(jnp.sin(out))

    def loss_dense(ar, ac, feat):
        out, _, _ = reference.gat_dense(adj, ar, ac, feat, 0.2)
        return jnp.sum(jnp.sin(out))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(ar, ac, feat)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(ar, ac, feat)
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_dense_bf16_close(rng):
    """Default bfloat16 MXU inputs stay within bf16 tolerance of f32."""
    g_dense, _, ar, ac, feat, adj = _setup(rng)
    out = gat_aggregate(g_dense, ar, ac, feat)  # bf16 dense matmuls
    ref, _, _ = reference.gat_dense(adj, ar, ac, feat, 0.2)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("p", [0.3, 0.7])
def test_dense_dropout_matches_binned(rng, p):
    """Attention dropout re-derived inside the dense kernels (pair_keep's
    hash from the tile's id vectors) must match the binned gather path
    bit-for-bit — same (seed, dst, src, head) keys — in value AND gradient
    (reference analogue: fused_gatconv_kernel.cu:95-104)."""
    g_dense, g_plain, ar, ac, feat, _ = _setup(rng)
    key = jax.random.PRNGKey(3)

    def loss(g, ar, ac, feat):
        out = gat_aggregate(g, ar, ac, feat, attn_drop=p, key=key,
                            training=True, dense_dtype="float32")
        return jnp.sum(jnp.sin(out)), out

    (_, out_d), gd = jax.value_and_grad(
        lambda *a: loss(g_dense, *a), argnums=(0, 1, 2), has_aux=True)(
            ar, ac, feat)
    (_, out_p), gp = jax.value_and_grad(
        lambda *a: loss(g_plain, *a), argnums=(0, 1, 2), has_aux=True)(
            ar, ac, feat)
    np.testing.assert_allclose(out_d, out_p, rtol=1e-4, atol=1e-5)
    for a, b in zip(gd, gp):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-4)


def test_plan_dense_small_graph_declines(rng):
    """Tiny low-degree graphs must not get a dense block under auto."""
    src, dst = random_graph(rng, 200, 4)
    g = build_graph(src, dst, 200, dense="auto")
    assert g.fwd.dense is None and g.bwd.dense is None
