from epnn_tpu.utils.timing import Timer, benchmark_fn

__all__ = ["Timer", "benchmark_fn"]
