"""A/B the fused Pallas bin kernels vs the XLA bin formulation on the TPU:
gat_aggregate forward + full model forward + a train step, on cora and
pubmed.  Run with DGNN_TPU_NO_PALLAS_BINS=1 for the XLA side."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache", "xla_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    x = jnp.ones((128, 128))
    print("health:", float(jnp.sum(x @ x)),
          "pallas_bins:", os.environ.get("DGNN_TPU_NO_PALLAS_BINS") != "1")

    from dgnn_tpu.data import load_citation_dataset
    from dgnn_tpu.graph import structure
    from dgnn_tpu.models import GAT
    from dgnn_tpu.ops.gat import gat_aggregate
    from dgnn_tpu.utils import time_epoch_loop
    from dgnn_tpu.utils.timing import time_op

    rng = np.random.default_rng(0)
    for name in ("cora", "pubmed"):
        data = load_citation_dataset(name, seed=0)
        n = data.num_nodes
        feat = jnp.asarray(data.features)
        ncls = data.n_classes
        g = structure.build_graph(data.src, data.dst, n, dense="auto",
                                  edge_tables=False)
        H, F = 4, 64
        ar = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
        ac = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
        xf = jnp.asarray(rng.normal(size=(n, H, F)), jnp.float32)
        gs = g.slim()
        dt = time_op(lambda a, b, c_, g_: gat_aggregate(g_, a, b, c_),
                     ar, ac, xf, gs, max_wall=25)
        print(f"{name} aggregate fwd: {dt*1e6:.1f} us")

        model = GAT(num_layers=1, n_hidden=64, n_classes=ncls, heads=(4, 1),
                    feat_drop=0.5, attn_drop=0.0)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), gs, feat)

        def infer_step(c, _k, cs):
            gg, ff = cs
            return model.apply(params, gg, ff + c * 1e-30)[0, 0]

        dt, _ = time_epoch_loop(infer_step, jnp.float32(0),
                                jax.random.PRNGKey(0), 200, warmup=2,
                                consts=(gs, feat), max_wall=30)
        print(f"{name} full fwd: {dt*1e6:.1f} us")

        labels = jnp.asarray(data.labels)
        tx = optax.chain(optax.add_decayed_weights(5e-4), optax.adam(1e-3))
        opt0 = tx.init(params)

        def train_step(carry, sub, cs):
            gg, ff, yy = cs
            p0, opt, _ = carry

            def loss_fn(p):
                logits = model.apply(p, gg, ff, training=True,
                                     rngs={"dropout": sub})
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, yy).mean()

            loss, grads = jax.value_and_grad(loss_fn)(p0)
            updates, opt = tx.update(grads, opt, p0)
            return optax.apply_updates(p0, updates), opt, loss

        carry = (params, opt0, jnp.float32(0))
        dt, _ = time_epoch_loop(train_step, carry, jax.random.PRNGKey(0), 100,
                                warmup=2, consts=(gs, feat, labels),
                                max_wall=40)
        print(f"{name} train step: {dt*1e6:.1f} us")


if __name__ == "__main__" and os.environ.get("EXP_COMPONENTS") != "1":
    main()


def components():
    """Speed-of-light components for pubmed's layer-1 aggregate: bare
    transposed gathers of all bins, and the fused kernels alone on
    pre-gathered blocks."""
    import jax
    import jax.numpy as jnp

    from dgnn_tpu.data import load_citation_dataset
    from dgnn_tpu.graph import structure
    from dgnn_tpu.ops.pallas_bins import bin_gat_fwd
    from dgnn_tpu.utils.timing import time_op

    rng = np.random.default_rng(0)
    data = load_citation_dataset("pubmed", seed=0)
    n = data.num_nodes
    g = structure.build_graph(data.src, data.dst, n, dense="auto",
                              edge_tables=False)
    H, F = 4, 64
    C = H * F + H
    xcat = jnp.asarray(rng.normal(size=(n, C)), jnp.float32)
    ar = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
    print("widths", g.fwd.widths,
          "slots", [x.size for x in g.fwd.nbr])

    def gather_all(xc, *nbrs):
        return sum(jnp.sum(xc[nb.T][:, :, 0]) for nb in nbrs) * 1e-30

    nbrs = [jnp.asarray(x) for x in g.fwd.nbr]
    dt = time_op(gather_all, xcat, *nbrs, max_wall=25)
    print(f"bare transposed gathers (all bins): {dt*1e6:.1f} us")

    for width, nbr, edge, row, count in g.fwd.bins():
        S = nbr.shape[0]
        g_t = jnp.asarray(rng.normal(size=(width, S, C)), jnp.float32)
        arb = jnp.concatenate([ar[row], ar[row]], axis=1)
        cnt = jnp.asarray(count)

        def k_only(gt, arb_, cnt_):
            m, l, lp, acc, accp = bin_gat_fwd(gt, arb_, cnt_, H=H, F=F,
                                              slope=0.2, with_pos=True)
            return acc
        dt = time_op(k_only, g_t, arb, cnt, max_wall=25)
        gb = width * S * C * 4 / 1e9
        print(f"kernel alone W={width} S={S}: {dt*1e6:.1f} us "
              f"({gb/dt:.0f} GB/s of {gb*1000:.0f} MB)")


if __name__ == "__main__" and os.environ.get("EXP_COMPONENTS") == "1":
    components()
