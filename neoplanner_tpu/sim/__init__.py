from neoplanner_tpu.sim import dynamics, env, missions

__all__ = ["dynamics", "env", "missions"]
