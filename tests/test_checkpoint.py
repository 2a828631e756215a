"""Checkpoint/resume round-trip via the orbax wrapper."""

import jax.numpy as jnp
import numpy as np

from dgnn_tpu.utils import CheckpointManager


def test_checkpoint_roundtrip(tmp_path):
    state = {"params": {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)},
             "step": jnp.int32(7)}
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    assert mgr.save(1, state, force=True)
    state2 = {"params": {"w": state["params"]["w"] * 2}, "step": jnp.int32(8)}
    assert mgr.save(2, state2, force=True)
    mgr.wait()

    template = {"params": {"w": jnp.zeros((2, 3), jnp.float32)},
                "step": jnp.int32(0)}
    step, restored = mgr.restore_latest(template)
    assert step == 2
    np.testing.assert_allclose(restored["params"]["w"],
                               np.asarray(state2["params"]["w"]))
    assert int(restored["step"]) == 8
    mgr.close()


def test_restore_empty_returns_none(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "empty"))
    assert mgr.restore_latest({"x": jnp.zeros(1)}) is None
    mgr.close()
