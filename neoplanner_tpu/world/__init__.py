from neoplanner_tpu.world import scenegen, voxelize, worldio

__all__ = ["scenegen", "voxelize", "worldio"]
