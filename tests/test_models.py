"""Layer/model smoke + training-dynamics tests: shapes, loss decreases."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dgnn_tpu.graph.structure import build_graph
from dgnn_tpu.models import DGCNN, GAT, GATConv, GMMConv, MoNet
from tests.conftest import random_graph


@pytest.fixture
def small_graph(rng):
    n = 40
    src, dst = random_graph(rng, n, 4)
    return build_graph(src, dst, n, widths=(4, 16)), n


def test_gatconv_shapes(rng, small_graph):
    g, n = small_graph
    feat = jnp.asarray(rng.normal(size=(n, 10)), jnp.float32)
    layer = GATConv(out_feats=8, num_heads=3, residual=True)
    params = layer.init(jax.random.PRNGKey(0), g, feat)
    out = layer.apply(params, g, feat)
    assert out.shape == (n, 3, 8)


def test_gat_net_trains(rng, small_graph):
    g, n = small_graph
    feat = jnp.asarray(rng.normal(size=(n, 12)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, n), jnp.int32)
    model = GAT(num_layers=1, n_hidden=8, n_classes=3, heads=[2, 1],
                feat_drop=0.2, attn_drop=0.2)
    params = model.init(jax.random.PRNGKey(0), g, feat)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        def loss_fn(p):
            logits = model.apply(p, g, feat, training=True,
                                 rngs={"dropout": key})
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses


def test_monet_trains(rng, small_graph):
    g, n = small_graph
    feat = jnp.asarray(rng.normal(size=(n, 10)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, n), jnp.int32)
    deg = jnp.maximum(g.in_degrees().astype(jnp.float32), 1.0)
    # pseudo coords = [1/sqrt(deg_u), 1/sqrt(deg_v)] per CSR edge
    # (reference train_gmmconv.py:120-122)
    row = jnp.repeat(jnp.arange(n), jnp.diff(g.row_ptr), total_repeat_length=g.num_edges)
    pseudo = jnp.stack([jax.lax.rsqrt(deg)[g.col_ind],
                        jax.lax.rsqrt(deg)[row]], axis=1)
    model = MoNet(n_hidden=8, out_feats=4, n_layers=1, dim=2, n_kernels=3,
                  dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), g, feat, pseudo)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, g, feat, pseudo)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(30):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses


def test_dgcnn_forward_and_step(rng):
    x = jnp.asarray(rng.normal(size=(2, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 5, 2), jnp.int32)
    model = DGCNN(k=8, feature_dims=(8, 8), emb_dims=(16, 16),
                  output_classes=5, dropout=0.5)
    variables = model.init(jax.random.PRNGKey(0), x)
    logits, _ = model.apply(variables, x, training=True,
                            rngs={"dropout": jax.random.PRNGKey(1)},
                            mutable=["batch_stats"])
    assert logits.shape == (2, 5)

    def loss_fn(params):
        out, _ = model.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             x, training=True,
                             rngs={"dropout": jax.random.PRNGKey(2)},
                             mutable=["batch_stats"])
        return optax.softmax_cross_entropy_with_integer_labels(out, labels).mean()

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    assert any(np.any(np.asarray(x) != 0) for x in flat)
