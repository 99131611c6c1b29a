from neoplanner_tpu.plan import costs, expert

__all__ = ["costs", "expert"]
