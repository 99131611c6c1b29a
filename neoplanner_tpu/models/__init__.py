from neoplanner_tpu.models import planner_net, resnet

__all__ = ["planner_net", "resnet"]
