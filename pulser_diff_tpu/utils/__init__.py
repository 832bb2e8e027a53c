from pulser_diff_tpu.utils.checkpoint import load_params, save_params
from pulser_diff_tpu.utils.export import export_step, load_meta, load_step
from pulser_diff_tpu.utils.profiling import profile_trace, timed

__all__ = [
    "save_params",
    "load_params",
    "timed",
    "profile_trace",
    "export_step",
    "load_step",
    "load_meta",
]
