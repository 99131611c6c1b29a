"""PlannerNet: the trajectory-initializer network.

Architecture parity with the reference
(/root/reference/src/planner/scripts/nn_trainer/nn_trainer.py:109-155):

  depth image --(encoder)--> 24        motion vector (24) --(MLP 48/24/24)--> 24
                     \\                      /
                      concat (48) --(MLP 48/96/96)--> 9 = 2 body-frame 3-D
                                                      waypoints + 3 durations

The I/O contract also matches NNPlanner's ONNX session
(nn_planner.py:14-17, 87-111): a flat float32 vector [flattened depth ‖ motion]
goes in, (B, 9) comes out. ``apply_flat`` consumes that contract directly;
``apply`` takes structured (image, motion) inputs for in-sim batched use.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from neoplanner_tpu.config import NetParams
from neoplanner_tpu.models.resnet import ResNet18, SmallConvEncoder


class _Conv1dStack(nn.Module):
    """Conv1d(1->16->32->64, k=3) + Flatten + Dense head — the motion/fusion
    feature stack of the reference's conv variant (nn_trainer_conv.py:123-145)."""

    out_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x[..., None]                              # (B, L, 1) channel-last
        for ch in (16, 32, 64):
            y = nn.Conv(ch, kernel_size=(3,), padding=1, dtype=self.dtype)(y)
            y = nn.leaky_relu(y)
        y = y.reshape(y.shape[0], -1)
        return nn.Dense(self.out_features, dtype=self.dtype)(y)


class PlannerNet(nn.Module):
    np_cfg: NetParams = NetParams()
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.np_cfg
        if cfg.backbone == "resnet18":
            self.img_backbone = ResNet18(num_features=cfg.img_feature_size,
                                         dtype=self.dtype)
        elif cfg.backbone == "smallconv":
            self.img_backbone = SmallConvEncoder(
                num_features=cfg.img_feature_size, dtype=self.dtype)
        else:
            raise ValueError(f"unknown backbone: {cfg.backbone}")
        if cfg.fusion_arch == "conv1d":
            # the reference's alternative trainer (nn_trainer_conv.py:123-145)
            self.motion_backbone = _Conv1dStack(cfg.motion_feature_size,
                                                dtype=self.dtype)
            self.mlp = _Conv1dStack(cfg.output_size, dtype=self.dtype)
        else:
            # motion MLP 24 -> 48 -> 24 -> 24 -> 24, LeakyReLU
            # (nn_trainer.py:124-132)
            self.motion_backbone = [nn.Dense(48, dtype=self.dtype),
                                    nn.Dense(24, dtype=self.dtype),
                                    nn.Dense(24, dtype=self.dtype),
                                    nn.Dense(cfg.motion_feature_size,
                                             dtype=self.dtype)]
            # fusion MLP 48 -> 48 -> 96 -> 96 -> 9 (nn_trainer.py:134-141)
            self.mlp = [nn.Dense(48, dtype=self.dtype),
                        nn.Dense(96, dtype=self.dtype),
                        nn.Dense(96, dtype=self.dtype),
                        nn.Dense(cfg.output_size, dtype=self.dtype)]

    def __call__(self, img, motion, train: bool = False):
        """img: (B, H, W, 1) float in [0, 255]; motion: (B, 24). -> (B, 9)."""
        img_feature = self.img_backbone(img, train=train)
        if self.np_cfg.fusion_arch == "conv1d":
            motion_feature = self.motion_backbone(motion)
            fused = jnp.concatenate([img_feature, motion_feature], axis=-1)
            return self.mlp(fused)
        x = motion
        for i, layer in enumerate(self.motion_backbone):
            x = layer(x)
            if i < len(self.motion_backbone) - 1:
                x = nn.leaky_relu(x)
        fused = jnp.concatenate([img_feature, x], axis=-1)
        y = fused
        for i, layer in enumerate(self.mlp):
            y = layer(y)
            if i < len(self.mlp) - 1:
                y = nn.leaky_relu(y)
        return y

    def apply_flat(self, flat, train: bool = False):
        """The ONNX I/O contract: flat (B, W*H + 24) -> (B, 9)
        (process_input_np, nn_trainer.py:52-59 + PlannerNet.forward :144-155)."""
        cfg = self.np_cfg
        n_img = cfg.img_width * cfg.img_height
        img = flat[:, :n_img].reshape(-1, cfg.img_height, cfg.img_width, 1)
        motion = flat[:, n_img:]
        return self(img, motion, train=train)


def create(np_cfg: NetParams = NetParams(), dtype=jnp.float32) -> PlannerNet:
    return PlannerNet(np_cfg=np_cfg, dtype=dtype)
