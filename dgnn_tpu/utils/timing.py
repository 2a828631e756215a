"""Measurement utilities: synchronized wall-clock timing and device memory.

Reference protocol analogue: 10 warmup iters with GPUtil memory sampling,
then cuda.synchronize-bracketed wall clock per epoch
(train_gatconv.py:125-161).

TPU-idiomatic difference: the epoch loop runs DEVICE-RESIDENT
(`lax.fori_loop` inside one jit) so per-step host dispatch never pollutes
the measurement — on a tunneled device, dispatch latency (~7ms) would
otherwise dominate small-graph epochs, and `block_until_ready` can return
before the device is done, so synchronization is a scalar device_get.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Timer", "time_fn", "time_op", "time_epoch_loop",
           "device_peak_memory_mb", "LAST_MEMORY_MB"]

# Static peak-memory estimate (MB) of the last time_epoch_loop executable,
# from XLA's compiled memory analysis (argument + temp + output - aliased).
# The axon backend exposes no runtime memory_stats(), so this is the
# benchmark's memory record (reference analogue: GPUtil max MB sampling,
# train_gatconv.py:134-135).
LAST_MEMORY_MB = {"value": None}


def fetch_scalar(tree):
    """Force a real device sync by fetching one scalar to the host."""
    leaf = jax.tree.leaves(tree)[0]
    return np.asarray(jax.jit(lambda x: x.ravel()[0])(leaf))


def time_epoch_loop(step, carry, key, epochs: int, warmup: int = 3,
                    min_signal: float = 0.2, max_epochs: int = 100_000,
                    consts=None, max_wall: float | None = None):
    """Seconds/epoch of ``carry = step(carry, subkey)`` run device-resident.

    One dispatch covers all epochs (lax.fori_loop with a dynamic trip count,
    so warmup and every timed run share one executable).  The constant
    dispatch + sync cost is measured exactly with a ZERO-trip run of the same
    executable and subtracted; the epoch count auto-scales (doubling) until
    the remaining signal exceeds ``min_signal`` seconds, so sub-millisecond
    epochs on a high-latency tunnelled device still time accurately.

    ``consts``: optional pytree of loop-invariant arrays (graph tables,
    features, ...).  When given, ``step(carry, subkey, consts)`` is called
    and the tree is threaded as a real jit argument — closing over large
    concrete arrays instead would bake them into the executable as
    compile-time constants (slow lowering, duplicated HBM).

    ``max_wall``: optional cap (seconds) on total measurement wall-clock —
    the auto-doubling stops once the accumulated run time exceeds it, and
    the best available estimate is returned (keeps benchmark configs inside
    a fixed driver budget even if min_signal was not reached).

    Returns (seconds_per_epoch, final_carry).
    """

    def runner_fn(state, n, cs):
        # consts ride as a separate, non-returned argument: returning them
        # with the state would make XLA allocate OUTPUT copies of the
        # loop-invariant arrays (3+ GB of graph tables at Reddit scale)
        def body(_, st):
            c, k = st
            k, sub = jax.random.split(k)
            c = step(c, sub) if cs is None else step(c, sub, cs)
            return c, k

        return jax.lax.fori_loop(0, n, body, state)

    runner = jax.jit(runner_fn)

    try:
        ma = runner.lower((carry, key), jnp.int32(0), consts)\
                   .compile().memory_analysis()
        peak = (ma.argument_size_in_bytes + ma.temp_size_in_bytes
                + ma.output_size_in_bytes - ma.alias_size_in_bytes)
        LAST_MEMORY_MB["value"] = round(peak / (1024 * 1024), 1)
    except Exception:
        LAST_MEMORY_MB["value"] = None

    state = runner((carry, key), jnp.int32(warmup), consts)
    fetch_scalar(state[0])

    def run(n):
        t0 = time.perf_counter()
        out = runner(state, jnp.int32(n), consts)
        fetch_scalar(out[0])
        return time.perf_counter() - t0, out

    t0a, _ = run(0)
    t0b, _ = run(0)
    base = min(t0a, t0b)
    n = max(int(epochs), 1)
    spent = 0.0
    while True:
        t, out = run(n)
        spent += t
        over = max_wall is not None and spent >= max_wall
        if t - base >= min_signal or n >= max_epochs or over:
            # The tunnelled device is shared and multi-tenancy throughput
            # DRIFTS ~2x on a minutes timescale (docs/PERF_NOTES.md round-5
            # re-profile), with noise strictly up-only.  Keep the MIN over
            # repeated runs — the machine number — repeating until two
            # runs land within 3% of the best (confirmed floor) or up to
            # 7 repeats / the wall budget.  Cheap configs afford many
            # repeats; expensive ones are bounded by max_wall as before.
            best = t
            confirms = 0
            for _ in range(7):
                if over or (max_wall is not None and spent + best > max_wall):
                    break
                t2, out = run(n)
                spent += t2
                over = max_wall is not None and spent >= max_wall
                if t2 < best * 0.97:
                    best = t2       # new floor found: require re-confirmation
                    confirms = 0
                elif t2 <= best * 1.03:
                    confirms += 1   # repeat within 3% of the floor
                    best = min(best, t2)
                    if confirms >= 2:
                        break
            t = best
            if t - base >= min_signal or n >= max_epochs or over:
                return max(t - base, 1e-9) / n, out[0]
            # the confirming run came in far below the first: the apparent
            # signal was dispatch jitter, not epochs — keep doubling
        n = min(2 * n, max_epochs)


def run_epochs(step, carry, key, epochs: int, consts=None,
               per_dispatch: int | None = None):
    """Run EXACTLY ``epochs`` iterations of ``carry = step(carry, subkey[,
    consts])`` device-resident and return the final carry.

    The accuracy protocol must use this, NOT the carry that falls out of
    time_epoch_loop: the measurement loop runs warmup + auto-scaled +
    repeated epochs (often 5-20x the requested count), and with coupled
    weight decay the over-trained parameters collapse (observed: citeseer
    test accuracy 0.33 from the measurement carry vs 0.78 at the exact
    epoch count).

    ``per_dispatch`` caps epochs per device call: one dispatch spanning
    minutes (e.g. 20 ModelNet epochs at ~11 s each) exceeds the tunnelled
    worker's tolerance and kills it."""

    def runner(state, n, cs):
        def body(_, st):
            c, k = st
            k, sub = jax.random.split(k)
            c = step(c, sub) if cs is None else step(c, sub, cs)
            return c, k

        return jax.lax.fori_loop(0, n, body, state)

    jitted = jax.jit(runner)
    state = (carry, key)
    chunk = per_dispatch or epochs
    done = 0
    while done < epochs:
        n = min(chunk, epochs - done)
        state = jitted(state, jnp.int32(n), consts)
        done += n
    fetch_scalar(state[0])
    return state[0]


def time_op(fn, *args, min_signal: float = 0.2, max_wall: float = 30.0):
    """Seconds per call of ``fn(*args)``, measured DEVICE-RESIDENT.

    Host-loop timing (time_fn) measures dispatch (~7-40 ms/call on the
    tunnelled device), not the op.  This wraps the op in time_epoch_loop's
    fori_loop: each iteration perturbs the first float arg by a scalar
    derived from the previous output (forces sequential execution, the
    1e-30 perturbation is exact-zero after the multiply rounds away), so
    the measured signal is N back-to-back device executions.
    """
    import jax

    def step(c, _k, cs):
        first, rest = cs[0], cs[1:]
        out = fn(first + (c * 1e-30).astype(first.dtype), *rest)
        # Reduce EVERY output element into the carry: keeping only one
        # element would let XLA dead-code-eliminate most of the op.
        tot = sum(jnp.sum(leaf.astype(jnp.float32))
                  for leaf in jax.tree.leaves(out))
        return c + tot * 1e-30

    dt, _ = time_epoch_loop(step, jnp.float32(0.0), jax.random.PRNGKey(0),
                            1, warmup=1, min_signal=min_signal, consts=args,
                            max_wall=max_wall)
    return dt


class Timer:
    def __init__(self):
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self._t0


def _sync(x):
    jax.block_until_ready(x)
    return x


def time_fn(fn, *args, iters: int = 10, warmup: int = 3):
    """Average seconds per call of fn(*args), output-synchronized."""
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def device_peak_memory_mb(device=None) -> float:
    """Peak device memory (MB) if the backend reports it, else -1."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return -1.0
    if not stats:
        return -1.0
    peak = stats.get("peak_bytes_in_use", stats.get("bytes_in_use", 0))
    return peak / (1024 * 1024)
