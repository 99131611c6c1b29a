from neoplanner_tpu.ops import edt, lbfgs, minco

__all__ = ["edt", "lbfgs", "minco"]
