"""Component-level timing of the Reddit GAT training step.

Breaks the 4-pass epoch into: dense kernels (fwd/bwd direction), their
setup/combine glue, the binned residual passes, feature transforms and the
optimizer — against the measured whole-step time, so the remaining gap to
the reference (0.652 s/epoch) is attributable.

Run on TPU: python scripts/profile_reddit_gat.py
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


def timeit(fn, *args, iters=10):
    from dgnn_tpu.utils.timing import fetch_scalar

    jfn = jax.jit(fn)
    out = jfn(*args)
    fetch_scalar(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    fetch_scalar(out)
    return (time.perf_counter() - t0) / iters


def main():
    from dgnn_tpu.graph import cache as gcache
    from dgnn_tpu.ops.pallas_dense import dense_gat_fwd, dense_gat_bwd

    path = os.path.join(REPO, ".bench_cache",
                        "rmat_graph_232965_114615892_d6.npz")
    g = gcache.load_graph(path)
    n = g.num_nodes
    H, F = 4, 64
    HF = H * F
    rng = np.random.default_rng(0)
    ar = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    ac = jnp.asarray(rng.normal(size=(n, H)).astype(np.float32))
    feat = jnp.asarray(rng.normal(size=(n, H, F)).astype(np.float32))

    db_f, db_b = g.fwd.dense, g.bwd.dense
    for tag, db in (("fwd", db_f), ("bwd", db_b)):
        T = db.mask.shape[0]
        pairs = T * 256 * 2048
        print(f"dense[{tag}]: R={db.row_ids.shape[0]} C={db.col_ids.shape[0]} "
              f"T={T} pairs={pairs/1e9:.2f}G", flush=True)
    for w, nbr, edge, row, count in g.fwd.bins():
        print(f"fwd bin w={w}: slots={nbr.size/1e6:.1f}M segs={len(row)/1e6:.2f}M")
    for w, nbr, edge, row, count in g.bwd.bins():
        print(f"bwd bin w={w}: slots={nbr.size/1e6:.1f}M segs={len(row)/1e6:.2f}M")

    # 1. dense fwd kernel alone (setup gathers OUTSIDE)
    ar_d = jnp.asarray(np.asarray(ar)[np.asarray(db_f.row_ids)])
    ac_d = jnp.asarray(np.asarray(ac)[np.asarray(db_f.col_ids)])
    x_d = jnp.asarray(np.asarray(feat).reshape(-1, HF)[np.asarray(db_f.col_ids)])
    t = timeit(lambda db, a, b, x: dense_gat_fwd(db, a, b, x, slope=0.2)[3],
               db_f, ar_d, ac_d, x_d)
    Tn = db_f.mask.shape[0]
    print(f"dense_fwd kernel: {t*1e3:7.1f}ms  "
          f"({Tn*256*2048/t/1e9:.1f} Gpair/s)", flush=True)

    # 2. dense fwd including its setup gathers
    t2 = timeit(lambda db, a, b, x: dense_gat_fwd(
        db, a[db.row_ids], b[db.col_ids], x.reshape(-1, HF)[db.col_ids],
        slope=0.2)[3], db_f, ar, ac, feat)
    print(f"dense_fwd + setup gathers: {t2*1e3:7.1f}ms", flush=True)

    # 3. dense bwd kernel alone
    zc = jnp.asarray(rng.normal(size=(db_b.col_ids.shape[0],
                                      HF + 4 * H)).astype(np.float32))
    ac_r = jnp.asarray(np.asarray(ac)[np.asarray(db_b.row_ids)])
    x_r = jnp.asarray(np.asarray(feat).reshape(-1, HF)[np.asarray(db_b.row_ids)])
    t3 = timeit(lambda db, a, x, zg, zs: dense_gat_bwd(
        db, a, x, zg, zs, slope=0.2, H=H)[0],
        db_b, ac_r, x_r, zc[:, :HF], zc[:, HF:])
    Tb = db_b.mask.shape[0]
    print(f"dense_bwd kernel: {t3*1e3:7.1f}ms  "
          f"({Tb*256*2048/t3/1e9:.1f} Gpair/s)", flush=True)

    # 4. one full forward (bins + dense + combine) — primal only
    from dgnn_tpu.ops.gat import _gat_forward
    gs = g.slim()
    t4 = timeit(lambda a, b, x, gg: _gat_forward(
        gg.fwd, a, b, x, 0.2, 0.0, jnp.uint32(0), False,
        with_pos=False)[0], ar, ac, feat, gs)
    print(f"full fwd pass (primal, H=4 F=64): {t4*1e3:7.1f}ms", flush=True)

    # 5. full forward with sign-split (training forward)
    t5 = timeit(lambda a, b, x, gg: _gat_forward(
        gg.fwd, a, b, x, 0.2, 0.0, jnp.uint32(0), True,
        with_pos=True)[0], ar, ac, feat, gs)
    print(f"full fwd pass (training, sign-split): {t5*1e3:7.1f}ms", flush=True)

    # 6. fwd+bwd through the custom vjp (both layers' worth: time one
    #    aggregate of each size)
    from dgnn_tpu.ops.gat import gat_aggregate

    def fwdbwd(a, b, x, gg):
        def f(a, b, x):
            return gat_aggregate(gg, a, b, x, training=True).sum()
        l, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(a, b, x)
        return grads[2]

    t6 = timeit(fwdbwd, ar, ac, feat, gs)
    print(f"L1 aggregate fwd+bwd (H=4 F=64): {t6*1e3:7.1f}ms", flush=True)

    # 7. output layer aggregate fwd+bwd (H=1, F=41)
    feat2 = jnp.asarray(rng.normal(size=(n, 1, 41)).astype(np.float32))
    ar2 = ar[:, :1]
    ac2 = ac[:, :1]
    t7 = timeit(fwdbwd, ar2, ac2, feat2, gs)
    print(f"L2 aggregate fwd+bwd (H=1 F=41): {t7*1e3:7.1f}ms", flush=True)

    print(f"sum of aggregate passes: {(t6+t7)*1e3:.1f}ms "
          f"(bench full step was ~964ms)", flush=True)

    # 8. the bench's exact train step (model + loss + adam), to attribute
    #    the gap between the aggregate passes and the whole epoch
    import optax

    from dgnn_tpu.models import GAT

    din, ncls = 602, 41
    feat_in = jnp.asarray(rng.normal(size=(n, din)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, ncls, n).astype(np.int32))
    model = GAT(num_layers=1, n_hidden=64, n_classes=ncls, heads=(4, 1),
                feat_drop=0.5, attn_drop=0.0)
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(key, gs, feat_in)
    tx = optax.chain(optax.add_decayed_weights(5e-4), optax.adam(1e-3))
    opt_state = tx.init(params)

    # NOTE: the graph/features ride as time_epoch_loop consts (jit
    # ARGUMENTS) — closing over them bakes 2.5GB of tables into the
    # executable as constants, which crashes the remote compile helper.
    from dgnn_tpu.utils.timing import time_epoch_loop

    def full_step(carry, sub, cs):
        gg, feat_in, labels = cs
        params, opt_state, _ = carry

        def loss_fn(p):
            logits = model.apply(p, gg, feat_in, training=True,
                                 rngs={"dropout": sub})
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t8, _ = time_epoch_loop(full_step, (params, opt_state, jnp.float32(0)),
                            key, 3, warmup=2,
                            consts=(gs, feat_in, labels), max_wall=60.0)
    print(f"full train step (model+loss+adam): {t8*1e3:7.1f}ms "
          f"(gap vs aggregates: {(t8-t6-t7)*1e3:.1f}ms)", flush=True)

    # 9. forward-only apply (training=True) — isolates fwd glue
    def fwd_step(c, sub, cs):
        gg, feat_in, _ = cs
        logits = model.apply(params, gg, feat_in + c * 1e-30, training=True,
                             rngs={"dropout": sub})
        return c + logits.ravel()[0] * 1e-30

    t9, _ = time_epoch_loop(fwd_step, jnp.float32(0), key, 3, warmup=2,
                            consts=(gs, feat_in, labels), max_wall=40.0)
    print(f"model.apply fwd (training): {t9*1e3:7.1f}ms", flush=True)


if __name__ == "__main__":
    main()
