"""Losses: symmetry-aware transformer loss and GAN BCE.

The transformer loss (reference ``pix2pose_model/ae_model.py:24-67``) scores
the predicted per-pixel coordinates against the ground truth under *every*
pose in the object's discrete-symmetry pool, keeps the per-sample minimum,
and couples the confidence head to the actual per-pixel error:

  loss = 3 * visible * L1_xyz + (1 - visible) * L1_xyz
         + 0.5 * (prob - min(L1_xyz, 1))^2       averaged over pixels,

where L1_xyz is the per-pixel mean-abs coordinate error under the best
symmetry pose and ``visible = prob_gt > 0.5``.

TPU notes: the symmetry transform is a single einsum over a stacked (S,3,3)
pool — one MXU contraction instead of the reference's per-matrix python loop;
the min is an argmin one-hot (the reference's equality-with-min switch
double-counts exact ties; measure-zero difference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def transformer_loss(pred_xyz, gt_xyz, prob_pred, prob_gt, sym_pool):
    """Per-sample symmetry-aware reconstruction loss.

    Args:
      pred_xyz: (B, H, W, 3) tanh output in [-1, 1].
      gt_xyz: (B, H, W, 3) target coordinate image in [-1, 1].
      prob_pred: (B, H, W, 1) sigmoid confidence/error output.
      prob_gt: (B, H, W, 1) visibility ground truth in [0, 1].
      sym_pool: (S, 3, 3) rotation pool; S=1 (identity) for asymmetric
        objects (reference builds the pool at ``3_train_pix2pose.py:98-109``).

    Returns:
      (B,) per-sample loss.
    """
    sym_pool = jnp.asarray(sym_pool, pred_xyz.dtype)
    prob = jnp.squeeze(prob_pred, axis=-1)
    visible = (jnp.squeeze(prob_gt, axis=-1) > 0.5).astype(pred_xyz.dtype)

    if sym_pool.shape[0] > 1:
        # (S, B, H, W, 3): rotate GT coordinates into each symmetry frame.
        gt_s = jnp.einsum("sij,bhwj->sbhwi", sym_pool, gt_xyz)
        diff = jnp.mean(jnp.abs(gt_s - pred_xyz[None]), axis=-1)  # (S,B,H,W)
        per_sym = jnp.sum(diff, axis=(2, 3))  # (S, B)
        best = jnp.argmin(per_sym, axis=0)  # (B,)
        loss_xyz = jnp.take_along_axis(
            diff, best[None, :, None, None], axis=0)[0]  # (B, H, W)
    else:
        loss_xyz = jnp.mean(jnp.abs(gt_xyz - pred_xyz), axis=-1)

    prob_loss = jnp.square(prob - jnp.minimum(loss_xyz, 1.0))
    loss = visible * loss_xyz * 3.0 + (1.0 - visible) * loss_xyz \
        + 0.5 * prob_loss
    return jnp.mean(loss, axis=(1, 2))


def bce_logits(logits, labels):
    """Mean binary cross-entropy on logits (keras BCE equivalent,
    reference ``3_train_pix2pose.py:180,185``). ``labels`` may be soft
    (label smoothing, reference ``3_train:48-49,61``)."""
    logits = logits.reshape(-1)
    labels = jnp.broadcast_to(jnp.asarray(labels, logits.dtype),
                              logits.shape)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits))))
