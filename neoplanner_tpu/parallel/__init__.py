from neoplanner_tpu.parallel import mesh

__all__ = ["mesh"]
