from neoplanner_tpu.core import frames, types

__all__ = ["frames", "types"]
