"""neoplanner_tpu — a TPU-native JAX framework for learning-initialized trajectory
optimization and vision-based autonomous quadrotor flight.

Re-designed from the ground up for TPU (JAX/XLA/Pallas/pjit) with the capabilities of
NEO-Planner (IROS'25, arXiv 2309.10683; reference: /root/reference, a ROS1/PX4/Gazebo
stack). The reference's multi-process node graph collapses into a single jit-compiled
closed loop over a batch axis of environments:

- ``ops.minco``     minimum-jerk (MINCO-style) piecewise-quintic trajectory math
- ``ops.lbfgs``     device-resident, vmappable L-BFGS with backtracking line search
- ``ops.edt``       exact Euclidean distance transform via min-plus matrix products
- ``mapping``       device-resident occupancy grid + ESDF (replaces octomap_server)
- ``plan``          expert / geometric / NN-initialized planners (replaces
                    src/planner/scripts/traj_planner/*)
- ``world``         procedural box worlds + voxelizer (replaces Gazebo worlds +
                    BuildOctomapPlugin)
- ``sense``         analytic depth-camera raycaster (replaces Gazebo depth camera)
- ``sim``           quadrotor dynamics + cascaded controller + mission FSM (replaces
                    PX4 SITL + MAVROS + manager_node)
- ``models/learn``  PlannerNet initializer network in flax + training (replaces
                    src/planner/scripts/nn_trainer/*)
- ``parallel``      device-mesh sharding of the env axis (the reference has no
                    distributed backend; here cross-chip = XLA collectives over ICI)
"""

__version__ = "0.1.0"

from neoplanner_tpu.config import PlannerParams, SimParams, CameraParams, MapParams

__all__ = [
    "PlannerParams",
    "SimParams",
    "CameraParams",
    "MapParams",
]
