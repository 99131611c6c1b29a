from neoplanner_tpu.io import octomap

__all__ = ["octomap"]
