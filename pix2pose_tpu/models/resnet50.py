"""ResNet-50 encoder trunk with tappable stage activations.

The reference modifies keras-applications ResNet50 to (a) add l2(1e-4)
kernel regularizers to every conv and (b) *name* the post-residual-add ReLUs
so the first three stage outputs can be tapped as U-Net skip sources
(``pix2pose_model/resnet50_mod.py:40-279``; taps consumed at
``ae_model.py:178-188``).

This is a from-scratch Flax implementation of the same trunk (stages 1-3
only — the BOP'20 encoder never runs stage 4/5). Weight decay is handled by
the optimizer (optax ``add_decayed_weights``), the idiomatic JAX equivalent
of layer-attached l2 regularizers.

Layout is NHWC (TPU-native). For a 128x128 input the taps are:
  stem ReLU      -> (64, 64, 64)    (reference tap ``act_conv1``)
  stage-2 block c -> (32, 32, 256)  (reference tap ``act2c_branch``)
  stage-3 block d -> (16, 16, 512)  (reference tap ``act3d_branch``)
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck residual block.

    ``project`` adds a strided 1x1 projection on the shortcut (the reference's
    ``conv_block``, ``resnet50_mod.py:75-118``); otherwise an identity
    shortcut (``identity_block``, ``resnet50_mod.py:40-72``).
    """

    filters: int  # bottleneck width; output is 4x this
    stride: int = 1
    project: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1.001e-5,
            dtype=self.dtype, name=name)
        shortcut = x
        if self.project:
            shortcut = nn.Conv(self.filters * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               dtype=self.dtype, name="proj_conv")(x)
            shortcut = norm("proj_bn")(shortcut)
        y = nn.Conv(self.filters, (1, 1), strides=(self.stride, self.stride),
                    dtype=self.dtype, name="conv_a")(x)
        y = nn.relu(norm("bn_a")(y))
        y = nn.Conv(self.filters, (3, 3), padding="SAME", dtype=self.dtype,
                    name="conv_b")(y)
        y = nn.relu(norm("bn_b")(y))
        y = nn.Conv(self.filters * 4, (1, 1), dtype=self.dtype,
                    name="conv_c")(y)
        y = norm("bn_c")(y)
        return nn.relu(y + shortcut)


class ResNet50Trunk(nn.Module):
    """Stages 1-3 of ResNet-50, returning the three U-Net taps."""

    dtype: Any = jnp.float32
    stage_blocks: Sequence[int] = (3, 4)  # blocks in stage 2, stage 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1.001e-5,
            dtype=self.dtype, name=name)
        # Stem: 7x7/2 conv (keras pads 3 on each side via ZeroPadding2D).
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    dtype=self.dtype, name="stem_conv")(x)
        f1 = nn.relu(norm("stem_bn")(y))  # (H/2, W/2, 64) — tap 'act_conv1'
        y = nn.max_pool(f1, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        # Stage 2 (stride kept at 1 on the projection like keras resnet50).
        y = Bottleneck(64, stride=1, project=True, dtype=self.dtype,
                       name="s2_b0")(y, train)
        for i in range(1, self.stage_blocks[0]):
            y = Bottleneck(64, dtype=self.dtype, name=f"s2_b{i}")(y, train)
        f2 = y  # (H/4, W/4, 256) — tap 'act2c_branch'
        # Stage 3.
        y = Bottleneck(128, stride=2, project=True, dtype=self.dtype,
                       name="s3_b0")(y, train)
        for i in range(1, self.stage_blocks[1]):
            y = Bottleneck(128, dtype=self.dtype, name=f"s3_b{i}")(y, train)
        f3 = y  # (H/8, W/8, 512) — tap 'act3d_branch'
        return f1, f2, f3
