from .timing import Timer, time_fn, device_peak_memory_mb
from .logging import append_csv_row

__all__ = ["Timer", "time_fn", "device_peak_memory_mb", "append_csv_row"]
