"""Pix2Pose GAN training step, TPU-first.

The reference alternates three Keras ``train_on_batch`` calls per iteration —
discriminator on generated images, discriminator on real XYZ targets (both
with label smoothing and whole-batch label flipping), then the combined
DCGAN step with loss weights [recon=100, adv=1]
(``tools/3_train_pix2pose.py:44-69,180-186,209-222``). Here the whole
iteration is ONE jitted, differentiable function: two discriminator adam
updates + one generator update, with the symmetry-aware transformer loss
fused in. Batch-parallel over a ``dp`` mesh axis (gradients all-reduced by
XLA via sharding); object-parallel scale-out stacks whole train states over
an ``obj`` axis (see ``pix2pose_tpu/parallel``) — replacing the reference's
sequential one-GPU-per-object shell loop (``train.sh:1-21``).

The learning rate is a runtime scalar (adam moments via
``optax.scale_by_adam``, lr applied to the normalized update), so the
BOP-challenge per-epoch schedule (``3_train:169-178``) needs no
recompilation.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from pix2pose_tpu.config import TrainConfig
from pix2pose_tpu.models.losses import bce_logits, transformer_loss


class GanTrainState(NamedTuple):
    gen_params: Any
    gen_stats: Any
    disc_params: Any
    disc_stats: Any
    gen_opt: Any
    disc_opt: Any
    step: jnp.ndarray


def _resnet_decay_mask(params):
    """True for leaves under the resnet trunk — keras attaches l2(1e-4) to
    every resnet conv kernel (``resnet50_mod.py:59,100,112``); the optax
    equivalent is decayed weights on those leaves (2x the l2 coefficient)."""

    def mask_leaf(path, _):
        return any(getattr(p, "key", None) == "trunk" for p in path)

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def _make_tx(cfg: TrainConfig, params, decay: bool):
    parts = []
    if decay:
        parts.append(optax.add_decayed_weights(
            2e-4, _resnet_decay_mask(params)))
    parts.append(optax.scale_by_adam(
        b1=cfg.adam_b1, b2=cfg.adam_b2, eps=cfg.adam_eps))
    return optax.chain(*parts)


def _apply(tx, grads, opt, params, lr):
    updates, opt = tx.update(grads, opt, params)
    updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
    return optax.apply_updates(params, updates), opt


def create_train_state(rng, gen_model, disc_model,
                       cfg: TrainConfig = TrainConfig(),
                       im_size: int = 128) -> GanTrainState:
    x = jnp.zeros((1, im_size, im_size, 3), jnp.float32)
    k1, k2 = jax.random.split(rng)
    gv = gen_model.init(k1, x)
    dv = disc_model.init(k2, x)
    gen_params, gen_stats = gv["params"], gv.get("batch_stats", {})
    disc_params, disc_stats = dv["params"], dv.get("batch_stats", {})
    gen_tx = _make_tx(cfg, gen_params, cfg.backbone == "resnet50")
    disc_tx = _make_tx(cfg, disc_params, False)
    return GanTrainState(
        gen_params=gen_params, gen_stats=gen_stats,
        disc_params=disc_params, disc_stats=disc_stats,
        gen_opt=gen_tx.init(gen_params), disc_opt=disc_tx.init(disc_params),
        step=jnp.zeros((), jnp.int32))


def make_train_step(gen_model, disc_model, cfg: TrainConfig):
    """Build the full GAN iteration as a pure function.

    ``step(state, batch, sym_pool, lr, key) -> (state, metrics)`` where
    batch: ``src`` (B,S,S,3) in [-1,1], ``tgt`` (B,S,S,3) in [-1,1],
    ``prob_gt`` (B,S,S,1); ``sym_pool``: (n_sym,3,3) with n_sym static.
    """
    decay = cfg.backbone == "resnet50"

    def disc_update(params, stats, opt, imgs, labels, lr):
        def loss_fn(p):
            logits, new = disc_model.apply(
                {"params": p, "batch_stats": stats}, imgs, train=True,
                mutable=["batch_stats"])
            return (bce_logits(logits.astype(jnp.float32), labels),
                    new["batch_stats"])

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        tx = _make_tx(cfg, params, False)
        params, opt = _apply(tx, grads, opt, params, lr)
        return params, new_stats, opt, loss

    def step(state: GanTrainState, batch, sym_pool, lr, key):
        src, tgt, prob_gt = batch["src"], batch["tgt"], batch["prob_gt"]
        bsz = src.shape[0]
        kf, kr, ks1, ks2 = jax.random.split(key, 4)

        # --- discriminator on fakes (generator in inference mode, like the
        # reference's generator.predict, ``3_train:46``) -------------------
        fake, _ = gen_model.apply(
            {"params": state.gen_params, "batch_stats": state.gen_stats},
            src)
        # under compute_dtype=bfloat16 the model emits bf16; losses/labels
        # stay fp32 (no-op casts in the fp32 configuration)
        fake = jax.lax.stop_gradient(fake).astype(jnp.float32)
        y_fake = jax.random.uniform(ks1, (bsz,), minval=0.0, maxval=0.1)
        flip_f = jax.random.bernoulli(kf, cfg.label_flipping)
        y_fake = jnp.where(flip_f, jnp.ones_like(y_fake), y_fake)
        dp, dstats, dopt, dl1 = disc_update(
            state.disc_params, state.disc_stats, state.disc_opt, fake,
            y_fake, lr)

        # --- discriminator on reals (``3_train:58-67``) -------------------
        y_real = jax.random.uniform(ks2, (bsz,), minval=0.9, maxval=1.0)
        flip_r = jax.random.bernoulli(kr, cfg.label_flipping)
        y_real = jnp.where(flip_r, jnp.zeros_like(y_real), y_real)
        dp, dstats, dopt, dl2 = disc_update(dp, dstats, dopt, tgt, y_real,
                                            lr)

        # --- generator (disc frozen; loss weights 100/1, ``3_train:73``) --
        def gen_loss_fn(gp):
            (gen_img, prob), new = gen_model.apply(
                {"params": gp, "batch_stats": state.gen_stats}, src,
                train=True, mutable=["batch_stats"])
            recon = jnp.mean(transformer_loss(
                gen_img.astype(jnp.float32), tgt,
                prob.astype(jnp.float32), prob_gt, sym_pool))
            logits = disc_model.apply(
                {"params": dp, "batch_stats": dstats}, gen_img)
            adv = bce_logits(logits.astype(jnp.float32), jnp.ones((bsz,)))
            total = cfg.loss_weight_recon * recon + cfg.loss_weight_gan * adv
            return total, (new["batch_stats"], recon, adv)

        (gtotal, (gstats, recon, adv)), ggrads = jax.value_and_grad(
            gen_loss_fn, has_aux=True)(state.gen_params)
        gtx = _make_tx(cfg, state.gen_params, decay)
        gparams, gopt = _apply(gtx, ggrads, state.gen_opt,
                               state.gen_params, lr)

        new_state = GanTrainState(
            gen_params=gparams, gen_stats=gstats, disc_params=dp,
            disc_stats=dstats, gen_opt=gopt, disc_opt=dopt,
            step=state.step + 1)
        metrics = {
            "disc_loss": (dl1 + dl2) / 2.0,
            "recon_loss": recon,
            "gen_adv_loss": adv,
            "gen_total": gtotal,
        }
        return new_state, metrics

    return step
