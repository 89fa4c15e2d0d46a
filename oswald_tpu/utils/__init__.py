from oswald_tpu.utils.metrics import Metrics, gcups, profile_trace

__all__ = ["Metrics", "gcups", "profile_trace"]
