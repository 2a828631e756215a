"""Isolate the bf16 gather_dtype hang: compile+run the pubmed GAT aggregate
with gather_dtype=bfloat16, step by step with flushed prints."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    d = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache", "xla_cache")
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    print("health:", float(jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128)))),
          flush=True)

    from dgnn_tpu.data import load_citation_dataset
    from dgnn_tpu.graph import structure
    from dgnn_tpu.ops.gat import gat_aggregate

    rng = np.random.default_rng(0)
    data = load_citation_dataset("pubmed", seed=0)
    n = data.num_nodes
    g = structure.build_graph(data.src, data.dst, n, dense="auto",
                              edge_tables=False).slim()
    H, F = 4, 64
    ar = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
    ac = jnp.asarray(rng.normal(size=(n, H)), jnp.float32)
    xf = jnp.asarray(rng.normal(size=(n, H, F)), jnp.float32)
    print("compiling bf16 aggregate fwd...", flush=True)
    out = jax.jit(lambda a, b, c: gat_aggregate(
        g, a, b, c, gather_dtype=jnp.bfloat16))(ar, ac, xf)
    jax.block_until_ready(out)
    print("fwd OK", float(jnp.sum(out)), flush=True)

    print("compiling bf16 fwd+bwd...", flush=True)
    grads = jax.jit(jax.grad(lambda a, b, c: jnp.sum(gat_aggregate(
        g, a, b, c, gather_dtype=jnp.bfloat16) ** 2), argnums=(0, 1, 2)))(
        ar, ac, xf)
    jax.block_until_ready(grads)
    print("bwd OK", flush=True)


if __name__ == "__main__":
    main()
