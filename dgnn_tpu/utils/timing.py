"""Measurement utilities: synchronized wall-clock timing and device memory.

Reference protocol analogue: 10 warmup iters with GPUtil memory sampling,
then cuda.synchronize-bracketed wall clock per epoch
(train_gatconv.py:125-161).  Here: `block_until_ready` brackets, and XLA's
per-device memory_stats for peak bytes.
"""

from __future__ import annotations

import time

import jax

__all__ = ["Timer", "time_fn", "device_peak_memory_mb"]


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
