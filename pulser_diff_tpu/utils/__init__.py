from pulser_diff_tpu.utils.checkpoint import load_params, save_params
from pulser_diff_tpu.utils.profiling import profile_trace, timed

__all__ = ["save_params", "load_params", "timed", "profile_trace"]
