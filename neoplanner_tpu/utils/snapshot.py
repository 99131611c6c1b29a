"""Env-state snapshots: checkpoint/resume for simulation state.

The reference has no sim-state checkpointing (SURVEY.md §5: model artifacts and
rosbags only). Here the entire world+mission state is one pytree of arrays, so a
snapshot is a single orbax save — batched rollouts, datagen campaigns, and long
benchmarks resume exactly.
"""

from __future__ import annotations

import os

import orbax.checkpoint as ocp

from neoplanner_tpu.sim.env import EnvState


def save(path: str, state: EnvState) -> str:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def load(path: str, template: EnvState) -> EnvState:
    """Restore into the shapes/dtypes of ``template`` (an EnvState from reset
    with matching static configuration)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)
