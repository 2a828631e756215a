"""One-off: rebuild the Reddit-scale graph cache in the dense-block format,
reusing the raw CSR/CSC arrays from an existing cache file (skips the R-MAT
generation + sorting)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(old_path, new_path):
    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side build only
    import jax.numpy as jnp

    from dgnn_tpu.graph import binning, cache, hub, structure

    t0 = time.time()
    z = np.load(old_path)
    meta = json.loads(bytes(z["meta_json"]).decode())
    row_ptr = z["row_ptr"].astype(np.int64)
    col_ind = z["col_ind"].astype(np.int64)
    col_ptr = z["col_ptr"].astype(np.int64)
    row_ind = z["row_ind"].astype(np.int64)
    permute = z["permute"].astype(np.int64)
    n = meta["num_nodes"]
    print(f"loaded raw arrays {time.time()-t0:.0f}s", flush=True)

    def one_dir(rp, ci, eids, opp_deg, tag):
        t1 = time.time()
        sel = hub.plan_dense(rp, ci, opp_deg)
        assert sel is not None, "expected a dense block at this scale"
        rows_sel, cols_sel, keep_tiles = sel
        print(f"{tag}: kept tiles {int(keep_tiles.sum())} "
              f"({time.time()-t1:.0f}s)", flush=True)
        plan, rp2, ci2, keep = hub.build_dense_numpy(rp, ci, rows_sel,
                                                     cols_sel, keep_tiles)
        print(f"{tag}: mask built, residual edges {len(ci2)} "
              f"({time.time()-t1:.0f}s)", flush=True)
        w = binning.auto_widths(np.diff(rp2))
        print(f"{tag}: widths {w}", flush=True)
        binned = binning.bin_csr(rp2, ci2, edge_ids=None, widths=w)
        slots = binned.padded_slots()
        print(f"{tag}: residual slots {slots} fill {binned.fill_ratio():.2f} "
              f"({time.time()-t1:.0f}s)", flush=True)
        return structure.from_binned(binned, with_edge=False, dense=plan)

    deg_in = np.diff(row_ptr)
    deg_out = np.diff(col_ptr)
    fwd = one_dir(row_ptr, col_ind, None, deg_out, "fwd")
    bwd = one_dir(col_ptr, row_ind, permute, deg_in, "bwd")
    g = structure.Graph(
        row_ptr=jnp.asarray(row_ptr, jnp.int32),
        col_ind=jnp.asarray(col_ind, jnp.int32),
        col_ptr=jnp.asarray(col_ptr, jnp.int32),
        row_ind=jnp.asarray(row_ind, jnp.int32),
        permute=jnp.asarray(permute, jnp.int32),
        fwd=fwd, bwd=bwd, num_nodes=n, num_edges=int(col_ind.shape[0]),
    )
    cache.save_graph(new_path, g)
    print(f"saved {new_path} ({time.time()-t0:.0f}s total)", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
