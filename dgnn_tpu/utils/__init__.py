from .timing import (Timer, run_epochs, time_fn, time_epoch_loop,
                     device_peak_memory_mb)
from .checkpoint import CheckpointManager
from .logging import append_csv_row
from .profiling import Roofline, gat_epoch_hbm_bytes, trace

__all__ = ["CheckpointManager", "Timer", "run_epochs", "time_fn", "time_epoch_loop", "device_peak_memory_mb", "append_csv_row",
           "Roofline", "gat_epoch_hbm_bytes", "trace"]
