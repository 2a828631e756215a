"""Ablation timing of the DGCNN train step: which part owns the ~70ms gap
between the sum of conv vjps (~64ms) + knn (~11ms) and the full 146ms step.

Run on TPU: python scripts/profile_edgeconv_ablate.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".bench_cache", "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from dgnn_tpu.graph.knn import knn_mask_neg
from dgnn_tpu.models.dgcnn import DGCNN, EdgeConv
from dgnn_tpu.utils.timing import time_epoch_loop


class ConvStack(nn.Module):
    """The 4 EdgeConv layers + knn only (no proj/head)."""
    k: int = 40
    feature_dims = (64, 64, 128, 256)

    @nn.compact
    def __call__(self, x, *, training=False):
        h = x
        tot = 0.0
        for i, dim in enumerate(self.feature_dims):
            mask = jax.lax.stop_gradient(knn_mask_neg(h, self.k))
            h = EdgeConv(dim, name=f"conv_{i}")(mask, h, training=training)
            h = nn.leaky_relu(h, negative_slope=0.2)
            tot = tot + jnp.sum(h)
        return tot


class HeadOnly(nn.Module):
    """proj + pooling + MLP head on a fixed [B,P,512] input."""
    emb_dims = (512, 512, 256)

    @nn.compact
    def __call__(self, h, *, training=False):
        h = nn.Dense(self.emb_dims[0], name="proj")(h)
        h = jnp.concatenate([jnp.max(h, 1), jnp.mean(h, 1)], -1)
        for i in range(1, len(self.emb_dims)):
            h = nn.Dense(self.emb_dims[i], name=f"emb_{i}")(h)
            h = nn.BatchNorm(use_running_average=not training,
                             name=f"bn_{i}")(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
            h = nn.Dropout(0.5)(h, deterministic=not training)
        return nn.Dense(40, name="head")(h)


def time_train(model, x, label_loss=True, has_bn=True, ms_tag=""):
    variables = model.init(jax.random.PRNGKey(0), x)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.sgd(0.1, momentum=0.9)
    opt_state = tx.init(params)
    y = jnp.zeros((x.shape[0],), jnp.int32)

    def step(carry, key, cs):
        params, batch_stats, opt_state = carry
        x, y = cs

        def loss_fn(p):
            out, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, x,
                training=True, rngs={"dropout": key},
                mutable=["batch_stats"])
            if label_loss:
                loss = -jax.nn.log_softmax(out, 1)[jnp.arange(len(y)), y].mean()
            else:
                loss = out
            return loss, upd.get("batch_stats", batch_stats)

        (loss, batch_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), batch_stats, opt_state)

    dt, _ = time_epoch_loop(step, (params, batch_stats, opt_state),
                            jax.random.PRNGKey(1), 1, warmup=1,
                            min_signal=0.4, consts=(x, y), max_wall=40.0)
    print(f"{ms_tag}: {dt*1e3:8.2f}ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    B, P = 64, 1024
    x = jnp.asarray(rng.normal(size=(B, P, 3)).astype(np.float32))
    h512 = jnp.asarray(rng.normal(size=(B, P, 512)).astype(np.float32))

    time_train(ConvStack(), x, label_loss=False, has_bn=False,
               ms_tag="conv stack only (4x knn+EdgeConv)")
    time_train(HeadOnly(), h512, ms_tag="proj+pool+MLP head only")
    time_train(DGCNN(k=40, output_classes=40, dropout=0.5), x,
               ms_tag="full DGCNN")


if __name__ == "__main__":
    main()
