"""Stage-2 classifier training: one jitted step over the full pipeline.

TPU-native re-design of the reference loop (classify_mamba.py:89-117):
the reference splits frozen-generator inference (no_grad), the combiner
and the classifier into three Python-level calls; here the whole
pipeline is ONE jitted function and freezing is an optimizer mask
(optax.set_to_zero on the ``generator`` subtree) -- same semantics as
``ref_model.eval()`` + optimizing only combiner+classifier params
(classify_mamba.py:53,57-64), but the generator forward fuses into the
same XLA program as the classifier.

Loss: BCE over the sigmoid of the single logit (classify_mamba.py:67,
104) -- computed as sigmoid_binary_cross_entropy on the raw logit for
numerical stability.  Per-tensor grad clip 1.0 mirrors the reference's
per-parameter clip loop (classify_mamba.py:106-107).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from gfe_mamba_tpu.training.metrics import binary_metrics, confusion_counts
from gfe_mamba_tpu.training.optim import (
    adam_with_param_clip, cast_for_compute, compute_dtype, masked_trainable,
)

Array = jax.Array


class ClassifyState(NamedTuple):
    step: Array
    params: Any
    opt_state: Any


def _is_generator(path) -> bool:
    return any(str(getattr(k, "key", k)) == "generator" for k in path)


class ClassifyTrainer:
    def __init__(self, pipeline, *, lr: float = 1e-4, grad_clip: float = 1.0,
                 mixed_precision: str = "bf16", init: str = "torch"):
        self.pipeline = pipeline
        self.dtype = compute_dtype(mixed_precision)
        self.base_tx = adam_with_param_clip(lr, grad_clip)
        # stateless: built once, reusable for any param tree (restoring a
        # checkpoint does not require calling init_state first)
        self.tx = masked_trainable(self.base_tx, _is_generator)
        # "torch" (default): re-draw Dense/Conv kernels+biases with the
        # reference's init laws (utils/initializers.py) -- the same
        # convergence physics GanTrainer(g_init="torch") fixed for
        # Stage 1.  Mamba's custom-law params (dt_proj_kernel/_bias,
        # A_log, D) are self.param leaves with non-kernel names, so the
        # resampler never touches them.  "flax": lecun_normal/zeros.
        if init not in ("torch", "flax"):
            raise ValueError(f"init must be 'torch' or 'flax', "
                             f"got {init!r}")
        self.init = init

    def init_state(self, rng: Array, sample_mri: Array, sample_cat: Array,
                   sample_num: Array, *, generator_params: Any = None
                   ) -> ClassifyState:
        params = self.pipeline.init(rng, sample_mri, sample_cat, sample_num)
        if self.init == "torch":
            from gfe_mamba_tpu.utils.initializers import resample_torch_init
            params = {**params, "params": resample_torch_init(
                params["params"], jax.random.fold_in(rng, 3))}
        if generator_params is not None:
            # splice in Stage-1 trained generator weights (after the
            # resample: the trained weights always win)
            params = {**params, "params": {
                **params["params"], "generator": generator_params}}
        return ClassifyState(step=jnp.zeros((), jnp.int32), params=params,
                             opt_state=self.tx.init(params["params"]))

    # ------------------------------------------------------------------
    def _loss(self, variables, mri, x_cat, x_num, labels, rng):
        cv = cast_for_compute(variables, self.dtype)
        logits = self.pipeline.apply(
            cv, cast_for_compute(mri, self.dtype), x_cat, x_num,
            deterministic=False, rngs={"dropout": rng})
        logits = logits.astype(jnp.float32).squeeze(-1)
        loss = jnp.mean(optax.sigmoid_binary_cross_entropy(
            logits, labels.astype(jnp.float32)))
        return loss, logits

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: ClassifyState, mri, x_cat, x_num, labels,
                   rng):
        def loss_fn(p):
            # stop_gradient on the frozen generator subtree: the
            # reference runs the generator under torch.no_grad()
            # (classify_mamba.py:100), so no cotangent ever flows into
            # it.  The optimizer mask alone zeroes the UPDATE but
            # leaves the generator backward in the graph -- XLA
            # computed and discarded ~130 ms of G bwd per step
            # (round 5: stage-2 199.5 -> see PERF_NOTES).  Grads for
            # generator leaves become exact zeros, identical to the
            # masked update; trainable-param grads are unchanged
            # (tests/test_training.py::test_stage2_stop_gradient).
            if "generator" in p:
                p = {**p, "generator":
                     jax.lax.stop_gradient(p["generator"])}
            return self._loss({**state.params, "params": p}, mri, x_cat,
                              x_num, labels, rng)

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params["params"])
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params["params"])
        params = {**state.params,
                  "params": optax.apply_updates(state.params["params"],
                                                updates)}
        # in-jit finite guard (SURVEY.md 5.3 -- the reference silently
        # trains on NaNs): a non-finite loss/grad step keeps the old
        # state; works under donation because the select happens inside
        # the traced function
        grads_finite = jnp.stack(
            [jnp.all(jnp.isfinite(g))
             for g in jax.tree_util.tree_leaves(grads)]).all()
        ok = jnp.isfinite(loss) & grads_finite

        def pick(new, old):
            if hasattr(new, "dtype") and jnp.issubdtype(new.dtype,
                                                        jnp.inexact):
                return jnp.where(ok, new, old)
            return new

        params = jax.tree_util.tree_map(pick, params, state.params)
        opt_state = jax.tree_util.tree_map(pick, opt_state, state.opt_state)
        new_state = ClassifyState(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        preds = jax.nn.sigmoid(logits)
        acc = jnp.mean(((preds >= 0.5) == (labels >= 0.5)).astype(jnp.float32))
        return new_state, {"cla_loss": loss, "batch_acc": acc,
                           "skipped": jnp.logical_not(ok).astype(jnp.float32)}

    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def eval_step(self, params, mri, x_cat, x_num, labels):
        """Eval forward -> (probabilities, loss, confusion counts)."""
        logits = self.pipeline.apply(params, mri, x_cat, x_num)
        logits = logits.astype(jnp.float32).squeeze(-1)
        probs = jax.nn.sigmoid(logits)
        loss = jnp.mean(optax.sigmoid_binary_cross_entropy(
            logits, labels.astype(jnp.float32)))
        counts = confusion_counts(probs, labels)
        return probs, loss, counts

    @staticmethod
    def metrics(counts) -> dict:
        from gfe_mamba_tpu.training.metrics import metrics_from_counts
        m = metrics_from_counts(counts)
        return {k: float(v) for k, v in m._asdict().items()}
