from neoplanner_tpu.utils import metrics

__all__ = ["metrics"]
