"""DCGAN discriminator (reference ``pix2pose_model/ae_model.py:153-172``).

Seven stride-2 3x3 conv blocks (filters 64*min(8, 2^i): 64,128,256,512x4)
with BatchNorm and LeakyReLU(0.2), then a single linear unit. Returns the
*logit* — the sigmoid lives in the loss (jax-idiomatic; the reference bakes
sigmoid into the layer and uses keras BCE)."""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class Discriminator(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = x
        for i in range(7):
            feats = 64 * min(8, 2 ** i)
            y = nn.Conv(feats, (3, 3), strides=(2, 2), padding="SAME",
                        dtype=self.dtype, name=f"conv{i + 1}")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype,
                             name=f"bn{i + 1}")(y)
            y = nn.leaky_relu(y, 0.2)
        y = y.reshape((y.shape[0], -1))
        logit = nn.Dense(1, dtype=self.dtype, name="fc")(y)
        return logit.astype(jnp.float32)
