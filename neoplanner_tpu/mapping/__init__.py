from neoplanner_tpu.mapping import esdf, occupancy

__all__ = ["esdf", "occupancy"]
