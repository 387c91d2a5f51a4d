"""Stage-1 GAN-ViT training: fused generator+discriminator train step.

TPU-native re-design of the reference loop (main_gan_vit.py:58-103):
the reference runs the generator forward TWICE per step (once for the
generator update, once no-grad for the discriminator update,
main_gan_vit.py:69,87).  Here both updates happen in ONE jitted step --
the reconstruction is computed once, the discriminator sees
``stop_gradient(recon)``, and XLA overlaps both backward passes.

Loss (main_gan_vit.py:43-44,50,70-77):
    L_G = L1(recon, pet) + 0.001 * perceptual + [epoch > 10] * 0.01 * adv
    L_D = 0.01 * 0.5 * (LS(D(fake), 0) + LS(D(real), 1))
The warm-up gate enters as a traced 0/1 scalar so epoch boundaries do
not trigger recompilation.  Gradient accumulation microbatches via
``lax.scan`` (config gradient_accumulation_steps).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from gfe_mamba_tpu.losses.gan import patch_adversarial_loss
from gfe_mamba_tpu.utils.initializers import resample_torch_init
from gfe_mamba_tpu.training.optim import (
    adam_with_global_clip, cast_for_compute, compute_dtype,
)

Array = jax.Array


class GanState(NamedTuple):
    step: Array
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any


class GanTrainer:
    def __init__(self, generator, discriminator, perceptual_loss, *,
                 lr_g: float = 1e-4, lr_d: float = 5e-4,
                 adv_weight: float = 0.01, perceptual_weight: float = 0.001,
                 grad_clip: float = 1.0, mixed_precision: str = "bf16",
                 accum_steps: int = 1, d_fresh_recon: bool = False,
                 g_init: str = "torch"):
        self.generator = generator
        self.discriminator = discriminator
        self.perceptual_loss = perceptual_loss
        self.adv_weight = adv_weight
        self.perceptual_weight = perceptual_weight
        self.accum = max(1, accum_steps)
        # reference semantics: the discriminator trains against a SECOND
        # no-grad generator forward run AFTER the G update
        # (main_gan_vit.py:69,87).  The default shares the pre-update
        # recon between both losses (one forward, ~30% faster step);
        # d_fresh_recon=True buys exact reference dynamics.
        self.d_fresh_recon = d_fresh_recon
        if d_fresh_recon and self.accum > 1:
            raise ValueError("d_fresh_recon requires accum_steps == 1")
        # "torch" (default): re-draw generator kernels/biases with the
        # reference's init laws -- convergence-critical on hard data
        # (utils/initializers.py: recon L1 0.083 -> 0.040 at 20 epochs).
        # "flax": keep lecun_normal/zeros.
        if g_init not in ("torch", "flax"):
            raise ValueError(f"g_init must be 'torch' or 'flax', "
                             f"got {g_init!r}")
        self.g_init = g_init
        self.dtype = compute_dtype(mixed_precision)
        self.g_tx = adam_with_global_clip(lr_g, grad_clip)
        self.d_tx = optax.adam(lr_d)

    # ------------------------------------------------------------------
    def init_state(self, rng: Array, sample_mri: Array,
                   sample_pet: Array) -> GanState:
        g_params = self.generator.init(rng, sample_mri)
        if self.g_init == "torch":
            g_params = {**g_params, "params": resample_torch_init(
                g_params["params"], jax.random.fold_in(rng, 2))}
        d_params = self.discriminator.init(
            jax.random.fold_in(rng, 1), sample_pet)
        return GanState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params, d_params=d_params,
            g_opt=self.g_tx.init(g_params["params"]),
            d_opt=self.d_tx.init(d_params["params"]),
        )

    # ------------------------------------------------------------------
    def _losses(self, g_params, d_params, mri, pet, adv_on, rng):
        cp = cast_for_compute(g_params, self.dtype)
        recon = self.generator.apply(
            cp, cast_for_compute(mri, self.dtype), train=True,
            rngs={"dropout": rng})
        recon_f32 = recon.astype(jnp.float32)

        recons_loss = jnp.mean(jnp.abs(recon_f32 - pet))
        p_loss = self.perceptual_loss(recon_f32, pet)
        logits_fake = self.discriminator.apply(d_params, recon_f32)[-1]
        gen_adv = patch_adversarial_loss(logits_fake, True, False)
        loss_g = (recons_loss + self.perceptual_weight * p_loss
                  + adv_on * self.adv_weight * gen_adv)
        return loss_g, (recon_f32, recons_loss, p_loss, gen_adv)

    def _d_loss(self, d_params, recon, pet, adv_on):
        logits_fake = self.discriminator.apply(
            d_params, jax.lax.stop_gradient(recon))[-1]
        loss_fake = patch_adversarial_loss(logits_fake, False, True)
        logits_real = self.discriminator.apply(d_params, pet)[-1]
        loss_real = patch_adversarial_loss(logits_real, True, True)
        return adv_on * self.adv_weight * 0.5 * (loss_fake + loss_real)

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: GanState, mri: Array, pet: Array,
                   adv_on: Array, rng: Array):
        """One fused G+D update.  adv_on: traced 0./1. warm-up gate.

        Gradient accumulation (config gradient_accumulation_steps):
        the batch splits into ``accum`` microbatches scanned
        sequentially with grad averaging -- one optimizer update per
        call, constant activation memory (main_gan_vit.py:68 semantics).
        BOTH the generator and the discriminator gradients accumulate
        over every microbatch, matching Accelerate's ``accumulate()``
        wrapping both backward passes (main_gan_vit.py:68-97).
        """

        def g_loss_fn(p, mri_mb, pet_mb, mb_rng):
            merged = {**state.g_params, "params": p}
            return self._losses(merged, state.d_params, mri_mb, pet_mb,
                                adv_on, mb_rng)

        def d_loss_fn(p, recon_mb, pet_mb):
            merged = {**state.d_params, "params": p}
            return self._d_loss(merged, recon_mb, pet_mb, adv_on)

        if self.accum > 1:
            bsz = mri.shape[0]
            assert bsz % self.accum == 0, (bsz, self.accum)
            mb = bsz // self.accum
            mri_mb = mri.reshape((self.accum, mb) + mri.shape[1:])
            pet_mb = pet.reshape((self.accum, mb) + pet.shape[1:])
            rngs = jax.random.split(rng, self.accum)

            def micro(carry, inp):
                g_acc, d_acc, aux_acc = carry
                x, y, r = inp
                (loss, aux), grads = jax.value_and_grad(
                    g_loss_fn, has_aux=True)(
                    state.g_params["params"], x, y, r)
                g_acc = jax.tree_util.tree_map(
                    lambda a, g: a + g / self.accum, g_acc, grads)
                recon, l1, pl_, adv = aux
                ld, d_grads_mb = jax.value_and_grad(d_loss_fn)(
                    state.d_params["params"], recon, y)
                d_acc = jax.tree_util.tree_map(
                    lambda a, g: a + g / self.accum, d_acc, d_grads_mb)
                aux_acc = (aux_acc[0] + l1 / self.accum,
                           aux_acc[1] + pl_ / self.accum,
                           aux_acc[2] + adv / self.accum,
                           aux_acc[3] + loss / self.accum,
                           aux_acc[4] + ld / self.accum)
                return (g_acc, d_acc, aux_acc), None

            zero_g = jax.tree_util.tree_map(
                jnp.zeros_like, state.g_params["params"])
            zero_d = jax.tree_util.tree_map(
                jnp.zeros_like, state.d_params["params"])
            init_aux = (0.0, 0.0, 0.0, 0.0, 0.0)
            (g_grads, d_grads, aux_acc), _ = jax.lax.scan(
                micro, (zero_g, zero_d, init_aux), (mri_mb, pet_mb, rngs))
            recons_loss, p_loss, gen_adv, loss_g, loss_d = aux_acc
        else:
            (loss_g, (recon, recons_loss, p_loss, gen_adv)), g_grads = \
                jax.value_and_grad(g_loss_fn, has_aux=True)(
                    state.g_params["params"], mri, pet, rng)
            if not self.d_fresh_recon:
                loss_d, d_grads = jax.value_and_grad(d_loss_fn)(
                    state.d_params["params"], recon, pet)
        g_updates, g_opt = self.g_tx.update(
            g_grads, state.g_opt, state.g_params["params"])
        g_params = {**state.g_params,
                    "params": optax.apply_updates(
                        state.g_params["params"], g_updates)}
        if self.accum == 1 and self.d_fresh_recon:
            # second no-grad generator forward with the UPDATED params,
            # train-mode dropout active (main_gan_vit.py:86-88 runs the
            # .train() model under no_grad)
            cp = cast_for_compute(g_params, self.dtype)
            recon_d = self.generator.apply(
                cp, cast_for_compute(mri, self.dtype), train=True,
                rngs={"dropout": jax.random.fold_in(rng, 1)},
            ).astype(jnp.float32)
            loss_d, d_grads = jax.value_and_grad(d_loss_fn)(
                state.d_params["params"], recon_d, pet)
        # gate the discriminator update entirely during warm-up: like the
        # reference's skipped opt_d.step() (main_gan_vit.py:84-97), the
        # optimizer STATE must not advance either -- a zero-grad Adam
        # step still increments the count and de-amplifies the bias
        # correction of the first real post-warm-up updates
        d_updates, d_opt_new = self.d_tx.update(
            d_grads, state.d_opt, state.d_params["params"])
        gate = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(adv_on > 0, a, b), new, old)
        d_opt = gate(d_opt_new, state.d_opt)
        d_params = {**state.d_params,
                    "params": gate(optax.apply_updates(
                        state.d_params["params"], d_updates),
                        state.d_params["params"])}

        # in-jit finite guard (SURVEY.md 5.3 -- the reference silently
        # trains on NaNs, main_gan_vit.py:78-97): a non-finite loss or
        # gradient keeps the OLD state for BOTH players; works under
        # donation because the select happens inside the traced function
        # (classify_trainer.py:91-106 pattern).
        def all_finite(tree):
            return jnp.stack(
                [jnp.all(jnp.isfinite(g))
                 for g in jax.tree_util.tree_leaves(tree)]).all()

        ok = (jnp.isfinite(loss_g) & jnp.isfinite(loss_d)
              & all_finite(g_grads) & all_finite(d_grads))

        def pick(new, old):
            if hasattr(new, "dtype") and jnp.issubdtype(new.dtype,
                                                        jnp.inexact):
                return jnp.where(ok, new, old)
            return new

        sel = lambda new, old: jax.tree_util.tree_map(pick, new, old)
        new_state = GanState(step=state.step + 1,
                             g_params=sel(g_params, state.g_params),
                             d_params=sel(d_params, state.d_params),
                             g_opt=sel(g_opt, state.g_opt),
                             d_opt=sel(d_opt, state.d_opt))
        logs = {"g_loss": loss_g, "d_loss": loss_d, "l1": recons_loss,
                "perceptual": p_loss, "gen_adv": gen_adv,
                "skipped": jnp.logical_not(ok).astype(jnp.float32)}
        return new_state, logs

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def generate(self, g_params, mri: Array) -> Array:
        """Eval-mode reconstruction (deterministic)."""
        return self.generator.apply(g_params, mri)
