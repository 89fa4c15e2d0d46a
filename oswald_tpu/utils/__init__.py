from oswald_tpu.utils.metrics import Metrics, gcups, profile_trace
from oswald_tpu.utils.compile_cache import enable_compile_cache

__all__ = ["Metrics", "gcups", "profile_trace", "enable_compile_cache"]
