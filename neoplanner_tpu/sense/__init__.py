from neoplanner_tpu.sense import raycast

__all__ = ["raycast"]
