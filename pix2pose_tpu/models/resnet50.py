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


def space_to_depth(x, block: int = 2):
    """NHWC (B,H,W,C) -> (B,H/b,W/b,b*b*C); channel layout
    ``(qv, qu, c)`` row-major within each block."""
    b, h, w, c = x.shape
    assert h % block == 0 and w % block == 0, (x.shape, block)
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // block, w // block, block * block * c)


def s2d_stem_kernel(k7):
    """Remap a classic (7,7,C,64) stride-2 stem kernel into the exactly
    equivalent (4,4,4*C,64) kernel for the space-to-depth stem.

    out[i,j] = sum_{a,b} k7[a,b] * xpad[2i+a, 2j+b] with pad 3; writing
    the input index m = 2i + (a-3) in block coordinates m = 2p + q gives
    block offset p - (i-2) = (a-3)//2 + 2 in 0..3 and parity
    q = (a-3) % 2 — a 4x4 stride-1 conv over 2x2-blocked input."""
    import numpy as np

    kh, kw, c, co = k7.shape
    assert (kh, kw) == (7, 7), k7.shape
    k2 = np.zeros((4, 4, 4 * c, co), np.asarray(k7).dtype)
    for a in range(7):
        for b in range(7):
            pv, qv = (a - 3) // 2 + 2, (a - 3) % 2
            pu, qu = (b - 3) // 2 + 2, (b - 3) % 2
            s = (qv * 2 + qu) * c
            k2[pv, pu, s:s + c] = np.asarray(k7)[a, b]
    return k2


class ResNet50Trunk(nn.Module):
    """Stages 1-3 of ResNet-50, returning the three U-Net taps.

    ``stem_s2d`` computes the 7x7/2 stem as a mathematically identical
    4x4/1 conv over space-to-depth(2x2) input (12 channels instead of
    3): the MXU contracts over kernel-window x input-channels, and 3
    input channels leave most of the 128-deep systolic contraction idle
    on the highest-resolution layer of the network. Off by default —
    the AE trunks keep the classic stem for ImageNet/keras weight
    import parity (utils/hdf5_import.py maps (7,7,3,64) kernels); the
    trained-from-scratch detector enables it. Equivalence is exact
    (tests/test_detector.py::test_s2d_stem_exact via
    :func:`s2d_stem_kernel`)."""

    dtype: Any = jnp.float32
    stage_blocks: Sequence[int] = (3, 4)  # blocks in stage 2, stage 3
    stem_s2d: bool = False
    # rematerialize each bottleneck in backward (gradients are the
    # same function). Tried because the detector step is HBM-bound
    # (deleting 1e12 head FLOPs saved only 4 ms), but measured
    # NEGATIVE there (75.2 vs 68.3 ms at batch 32 @ 384^2 bf16): the
    # recompute re-reads its inputs, and at these shapes that exceeds
    # the backward activation traffic saved. A memory knob for larger
    # configs, not a speed knob; off by default.
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1.001e-5,
            dtype=self.dtype, name=name)
        # Stem: 7x7/2 conv (keras pads 3 on each side via ZeroPadding2D).
        if self.stem_s2d:
            # block row i needs input blocks i-2..i+1 -> pad (2, 1)
            y = nn.Conv(64, (4, 4), padding=[(2, 1), (2, 1)],
                        dtype=self.dtype,
                        name="stem_conv")(space_to_depth(x))
        else:
            y = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=[(3, 3), (3, 3)],
                        dtype=self.dtype, name="stem_conv")(x)
        f1 = nn.relu(norm("stem_bn")(y))  # (H/2, W/2, 64) — tap 'act_conv1'
        y = nn.max_pool(f1, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        blk = (nn.remat(Bottleneck, static_argnums=(2,)) if self.remat
               else Bottleneck)
        # Stage 2 (stride kept at 1 on the projection like keras resnet50).
        y = blk(64, stride=1, project=True, dtype=self.dtype,
                name="s2_b0")(y, train)
        for i in range(1, self.stage_blocks[0]):
            y = blk(64, dtype=self.dtype, name=f"s2_b{i}")(y, train)
        f2 = y  # (H/4, W/4, 256) — tap 'act2c_branch'
        # Stage 3.
        y = blk(128, stride=2, project=True, dtype=self.dtype,
                name="s3_b0")(y, train)
        for i in range(1, self.stage_blocks[1]):
            y = blk(128, dtype=self.dtype, name=f"s3_b{i}")(y, train)
        f3 = y  # (H/8, W/8, 512) — tap 'act3d_branch'
        return f1, f2, f3
