"""Pix2Pose autoencoder generator (both backbones) in Flax.

Re-designs the reference Keras graphs (``pix2pose_model/ae_model.py``):

- ``paper`` backbone: 4 stages of *paired* stride-2 5x5 convs (the two convs
  of a stage both read the previous stage's concat output; their outputs are
  concatenated -> channels 128/256/256/512 at 64/32/16/8 squared), bottleneck
  Flatten -> Dense(256) -> Dense(8*8*256), decoder of 3x (ConvTranspose 5x5/2
  + skip-concat from the *second* conv of the matching encoder stage + 5x5
  conv), and two ConvTranspose heads: tanh XYZ (3ch) and sigmoid
  error/confidence (1ch). Reference ``ae_model.py:70-150``.
- ``resnet50`` backbone (BOP'20): encoder replaced by ResNet-50 stages 1-3;
  skips take channel slices [:32]/[:128]/[:128] of the stage taps; one extra
  paired-conv stage to 8x8x512 feeds the same bottleneck/decoder. Reference
  ``ae_model.py:175-240``.

TPU notes: NHWC layout; all convs land on the MXU via XLA; ``dtype`` can be
bfloat16 for inference (params stay fp32). BatchNorm uses Keras defaults
(momentum .99, eps 1e-3) so imported reference weights reproduce numerics.
LeakyReLU slope is 0.3 (Keras 2.2 default used by the generator).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pix2pose_tpu.models.resnet50 import ResNet50Trunk

_LEAK = 0.3  # keras LeakyReLU() default used throughout the generator


class _ConvBNAct(nn.Module):
    features: int
    kernel: int = 5
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    dtype=self.dtype, name="conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(y)
        return nn.leaky_relu(y, _LEAK)


class _DeconvBNAct(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # flax "SAME" reproduces TF/Keras Conv2DTranspose 'same' (k5/s2)
        # EXACTLY — validated against real tf.keras in
        # tests/test_tf_golden.py. (An earlier ((2,3),(2,3)) variant
        # matched a torch oracle that itself was one pixel off TF.)
        y = nn.ConvTranspose(self.features, (5, 5), strides=(2, 2),
                             padding="SAME", dtype=self.dtype,
                             name="deconv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(y)
        return nn.leaky_relu(y, _LEAK)


class PairedConvEncoder(nn.Module):
    """The paper's twin-conv encoder (``ae_model.py:74-106``).

    Returns the 8x8x512 bottleneck input plus the three skip features
    (second conv of stages 1-3).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        skips = []
        feats = x
        for stage, ch in enumerate((64, 128, 128, 256)):
            a = _ConvBNAct(ch, stride=2, dtype=self.dtype,
                           name=f"e{stage + 1}_1")(feats, train)
            b = _ConvBNAct(ch, stride=2, dtype=self.dtype,
                           name=f"e{stage + 1}_2")(feats, train)
            feats = jnp.concatenate([a, b], axis=-1)
            skips.append(b)
        # skips[0]: 64^2x64, skips[1]: 32^2x128, skips[2]: 16^2x128
        return feats, (skips[0], skips[1], skips[2])


class ResNetEncoder(nn.Module):
    """BOP'20 encoder: ResNet-50 taps + extra paired stage to 8x8x512
    (``ae_model.py:178-196``)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f1, f2, f3 = ResNet50Trunk(dtype=self.dtype, name="trunk")(x, train)
        a = _ConvBNAct(256, stride=2, dtype=self.dtype, name="e4_1")(f3, train)
        b = _ConvBNAct(256, stride=2, dtype=self.dtype, name="e4_2")(f3, train)
        feats = jnp.concatenate([a, b], axis=-1)
        # channel slices as skip sources (``ae_model.py:186-188``)
        return feats, (f1[..., :32], f2[..., :128], f3[..., :128])


class AutoEncoder(nn.Module):
    """Generator: image (B,128,128,3) in [-1,1] -> (xyz in [-1,1],
    confidence/error in [0,1])."""

    backbone: str = "paper"  # "paper" | "resnet50"
    bottleneck: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.backbone == "resnet50":
            feats, (s1, s2, s3) = ResNetEncoder(dtype=self.dtype,
                                                name="encoder")(x, train)
        else:
            feats, (s1, s2, s3) = PairedConvEncoder(dtype=self.dtype,
                                                    name="encoder")(x, train)
        b, h, w, c = feats.shape  # (B, 8, 8, 512)
        z = feats.reshape((b, h * w * c))
        z = nn.Dense(self.bottleneck, dtype=self.dtype, name="fc_enc")(z)
        z = nn.Dense(8 * 8 * 256, dtype=self.dtype, name="fc_dec")(z)
        y = z.reshape((b, 8, 8, 256))

        y = _DeconvBNAct(256, dtype=self.dtype, name="d1")(y, train)  # 16^2
        y = jnp.concatenate([y, s3], axis=-1)
        y = _ConvBNAct(256, dtype=self.dtype, name="d1_uni")(y, train)

        y = _DeconvBNAct(128, dtype=self.dtype, name="d2")(y, train)  # 32^2
        y = jnp.concatenate([y, s2], axis=-1)
        y = _ConvBNAct(256, dtype=self.dtype, name="d2_uni")(y, train)

        y = _DeconvBNAct(64, dtype=self.dtype, name="d3")(y, train)  # 64^2
        y = jnp.concatenate([y, s1], axis=-1)
        y = _ConvBNAct(128, dtype=self.dtype, name="d3_uni")(y, train)

        xyz = nn.ConvTranspose(3, (5, 5), strides=(2, 2),
                               padding="SAME",
                               dtype=self.dtype, name="head_xyz")(y)
        xyz = jnp.tanh(xyz)
        prob = nn.ConvTranspose(1, (5, 5), strides=(2, 2),
                                padding="SAME",
                                dtype=self.dtype, name="head_prob")(y)
        prob = nn.sigmoid(prob)
        return xyz.astype(jnp.float32), prob.astype(jnp.float32)


def build_generator(backbone: str = "paper", dtype=jnp.float32) -> AutoEncoder:
    return AutoEncoder(backbone=backbone, dtype=dtype)
