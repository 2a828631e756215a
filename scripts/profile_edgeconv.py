"""Per-component timing of the DGCNN training step at the benchmark config
(B=64, P=1024, k=40) — finds where the ~150 ms/step goes.

All timings are DEVICE-RESIDENT (utils.timing.time_op): a host loop on the
tunnelled device measures dispatch (~7-40 ms/call), not the op.

Run on TPU: python scripts/profile_edgeconv.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(REPO, ".bench_cache", "xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from dgnn_tpu.graph.knn import knn_mask_neg
from dgnn_tpu.ops.edgeconv import (_ecd_dsrc, _masked_max,
                                   _masked_max_argmax, edge_conv_max_dense)
from dgnn_tpu.utils.timing import time_op


def main():
    rng = np.random.default_rng(0)
    B, P, k = 64, 1024, 40
    ms = 1e3

    # --- knn at each layer's input width ---
    for Fin in (3, 64, 128):
        h = jnp.asarray(rng.normal(size=(B, P, Fin)).astype(np.float32))
        t_d2 = time_op(lambda x: jnp.einsum(
            "bpd,bqd->bpq", x, x, preferred_element_type=jnp.float32), h)
        t_knn = time_op(lambda x: knn_mask_neg(x, k), h)
        t_exact = time_op(lambda x: knn_mask_neg(x, k, exact=True), h)
        print(f"knn Fin={Fin}: d2={t_d2*ms:6.2f}ms bisect_total="
              f"{t_knn*ms:6.2f}ms exact_total={t_exact*ms:6.2f}ms", flush=True)

    # --- conv fwd / fwd+argmax / bwd at each layer's output width ---
    h64 = jnp.asarray(rng.normal(size=(B, P, 64)).astype(np.float32))
    mask = jax.jit(lambda h: knn_mask_neg(h, k))(h64)
    for F in (64, 128, 256):
        h = jnp.asarray(rng.normal(size=(B, P, F)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(B, P, F)).astype(np.float32))
        kstar = jax.jit(_masked_max_argmax)(mask, h)[1]
        t_fwd = time_op(lambda m, a: _masked_max(m, a), mask, h)
        t_fwda = time_op(lambda m, a: _masked_max_argmax(m, a)[0], mask, h)
        t_bwd = time_op(lambda ks, gg: _ecd_dsrc(ks, gg), kstar, g)

        def train(a, m, gg):
            out, vjp = jax.vjp(lambda a: edge_conv_max_dense(m, a, a), a)
            return vjp(gg)[0]

        t_full = time_op(train, h, mask, g)
        print(f"conv F={F}: fwd={t_fwd*ms:6.2f}ms fwd+argmax={t_fwda*ms:6.2f}ms "
              f"bwd={t_bwd*ms:6.2f}ms vjp_total={t_full*ms:6.2f}ms", flush=True)

    # --- whole training step (bench protocol) ---
    import optax

    from dgnn_tpu.models import DGCNN

    model = DGCNN(k=k, output_classes=40, dropout=0.5)
    x = jnp.asarray(rng.normal(size=(B, P, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 40, B).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), x)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(0.1, momentum=0.9))
    opt_state = tx.init(params)

    from dgnn_tpu.utils.timing import time_epoch_loop

    def step(carry, key, cs):
        params, batch_stats, opt_state = carry
        x, y = cs

        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, x,
                training=True, rngs={"dropout": key}, mutable=["batch_stats"])
            oh = jax.nn.one_hot(y, 40)
            sm = oh * 0.8 + (1 - oh) * 0.2 / 39
            loss = -(sm * jax.nn.log_softmax(logits, 1)).sum(1).mean()
            return loss, upd["batch_stats"]

        (loss, batch_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), batch_stats, opt_state)

    dt, _ = time_epoch_loop(step, (params, batch_stats, opt_state),
                            jax.random.PRNGKey(1), 1, warmup=1,
                            min_signal=0.5, consts=(x, y), max_wall=40.0)
    print(f"full train step: {dt*ms:7.2f}ms  (x153 steps = {dt*153:.1f}s/epoch;"
          f" reference 17.39s = 113.7ms/step)", flush=True)

    # fwd-only apply
    def fstep(c, key, cs):
        x, y = cs
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             x + c * 1e-30)
        return c + logits.ravel()[0] * 1e-30

    dtf, _ = time_epoch_loop(fstep, jnp.float32(0), jax.random.PRNGKey(1), 1,
                             warmup=1, min_signal=0.5, consts=(x, y),
                             max_wall=30.0)
    print(f"model fwd (inference): {dtf*ms:7.2f}ms", flush=True)


if __name__ == "__main__":
    main()
