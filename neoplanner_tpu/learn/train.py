"""PlannerNet training: Adam + MSE imitation of the expert, orbax checkpoints.

Replaces the reference's torch trainer
(/root/reference/src/planner/scripts/nn_trainer/nn_trainer.py:158-312): same loss
(MSE, mean reduction), same optimizer family (Adam, lr 1e-3), same 80/20 split; the
torch DataLoader with 24 workers becomes device-resident arrays sliced per step
(the whole dataset fits HBM at these sizes), and .pth/.onnx artifacts become orbax
checkpoints. A ``freeze_backbone`` mask reproduces the reference's frozen-trunk
regime (nn_trainer.py:115-117) via zeroed updates.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from neoplanner_tpu.config import NetParams
from neoplanner_tpu.models import planner_net


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 1e-3     # nn_trainer.py:31
    batch_size: int = 64            # reference uses 2 (:27) — tuned up for TPU
    epochs: int = 5                 # nn_trainer.py:28
    train_split: float = 0.8        # nn_trainer.py:30
    seed: int = 42                  # nn_trainer.py:32
    freeze_backbone: bool = False   # parity switch for nn_trainer.py:115-117


def init_params(key: jnp.ndarray, np_cfg: NetParams) -> Dict[str, Any]:
    model = planner_net.create(np_cfg)
    dummy_img = jnp.zeros((1, np_cfg.img_height, np_cfg.img_width, 1))
    dummy_motion = jnp.zeros((1, np_cfg.motion_input_size))
    variables = model.init(key, dummy_img, dummy_motion, train=False)
    return dict(variables)


def _freeze_mask(params) -> Any:
    """True (train) everywhere except the ResNet trunk; conv1-equivalent and the
    feature head stay trainable as in the reference's surgery."""
    def mask_fn(path, _leaf):
        keys = [str(p.key) if hasattr(p, "key") else str(p) for p in path]
        in_backbone = any("img_backbone" in k for k in keys)
        trunk = in_backbone and not any("Dense" in k for k in keys)
        first_conv = in_backbone and any(k == "Conv_0" for k in keys)
        return not (trunk and not first_conv)
    return jax.tree_util.tree_map_with_path(mask_fn, params)


def make_optimizer(cfg: TrainConfig, params) -> optax.GradientTransformation:
    tx = optax.adam(cfg.learning_rate)
    if cfg.freeze_backbone:
        tx = optax.chain(optax.masked(tx, _freeze_mask(params)),
                         optax.masked(optax.set_to_zero(),
                                      jax.tree_util.tree_map(
                                          lambda m: not m,
                                          _freeze_mask(params))))
    return tx


def train(key: jnp.ndarray, depths: np.ndarray, motions: np.ndarray,
          labels: np.ndarray, np_cfg: NetParams,
          cfg: TrainConfig = TrainConfig(),
          log_every: int = 0) -> Tuple[Dict[str, Any], Dict[str, list]]:
    """Train on (N, h, w) depth images + (N, 24) motions -> (N, 9) labels.

    Returns (variables, history) where variables = {'params', 'batch_stats'}.
    """
    model = planner_net.create(np_cfg)
    k_init, k_perm = jax.random.split(jax.random.PRNGKey(cfg.seed))
    variables = init_params(k_init, np_cfg)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    n = len(depths)
    n_train = int(cfg.train_split * n)
    perm = np.asarray(jax.random.permutation(k_perm, n))
    tr, te = perm[:n_train], perm[n_train:]

    depths = jnp.asarray(depths)[..., None]     # (N, h, w, 1)
    motions = jnp.asarray(motions)
    labels = jnp.asarray(labels)

    tx = make_optimizer(cfg, params)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, img, mot, lab):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, img, mot, train=True,
                mutable=["batch_stats"])
            return jnp.mean((out - lab) ** 2), updates["batch_stats"]
        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    @jax.jit
    def eval_step(params, batch_stats, img, mot, lab):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          img, mot, train=False)
        return jnp.mean((out - lab) ** 2)

    history = {"train_loss": [], "test_loss": []}
    bs = cfg.batch_size
    rngs = np.random.default_rng(cfg.seed)
    for epoch in range(cfg.epochs):
        order = rngs.permutation(len(tr))
        losses = []
        for i in range(0, len(tr) - bs + 1, bs) or [0]:
            idx = tr[order[i:i + bs]]
            if len(idx) == 0:
                idx = tr[: min(bs, len(tr))]
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, depths[idx], motions[idx],
                labels[idx])
            losses.append(float(loss))
        history["train_loss"].append(float(np.mean(losses)))
        if len(te):
            history["test_loss"].append(float(eval_step(
                params, batch_stats, depths[te], motions[te], labels[te])))
        if log_every and (epoch + 1) % log_every == 0:
            print(f"epoch {epoch + 1}: train {history['train_loss'][-1]:.4f}"
                  + (f" test {history['test_loss'][-1]:.4f}" if len(te) else ""))

    return {"params": params, "batch_stats": batch_stats}, history


def save_checkpoint(path: str, variables, np_cfg: NetParams) -> None:
    """Orbax checkpoint (replaces .pth/.onnx artifacts, nn_trainer.py:252-284).
    The net config rides alongside as JSON (orbax stores arrays, not strings)."""
    import json
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, {"variables": variables}, force=True)
    with open(path + ".netcfg.json", "w") as f:
        json.dump(dataclasses.asdict(np_cfg), f)


def load_checkpoint(path: str) -> Tuple[Dict[str, Any], NetParams]:
    """Device-agnostic restore: checkpoints written on TPU embed the device in
    their sharding metadata, which StandardCheckpointer replays verbatim and
    fails on any other backend (e.g. the CPU test harness). Restoring as plain
    numpy sidesteps the recorded sharding; jit re-places the arrays on use."""
    import json
    import os

    import numpy as np
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        meta = ckptr.metadata(path).item_metadata
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
        restored = ckptr.restore(path, restore_args=restore_args)
    with open(path + ".netcfg.json") as f:
        np_cfg = NetParams(**json.load(f))
    return restored["variables"], np_cfg
