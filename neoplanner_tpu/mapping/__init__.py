from neoplanner_tpu.mapping import esdf

__all__ = ["esdf"]
