#!/usr/bin/env python
"""Table-only FT-Transformer baseline (reference table/FT_table.py +
FT_table_dataloader.py): train a tabular classifier directly on the
clinical-scale CSV, no imaging.

Usage: python ft_table.py --table_path <csv> [--epochs 50] [--dim 32]
       [--depth 6] [--heads 8] [--batch 64] [--split 0.8] [--seed 0]
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from gfe_mamba_tpu.data.table import prepare_table
from gfe_mamba_tpu.models.ft_transformer import FTTransformer
from gfe_mamba_tpu.training.metrics import binary_metrics


def main(args):
    df = pd.read_csv(args.table_path)
    df = df[~df["LABEL"].isna()]
    table = prepare_table(df)
    labels = df["LABEL"].astype(int).to_numpy()
    cate, conti = table["cate_x"], table["conti_x"]

    rng = np.random.RandomState(args.seed)
    order = rng.permutation(len(labels))
    cut = int(len(order) * args.split)
    tr, te = order[:cut], order[cut:]

    model = FTTransformer(
        categories=tuple(table["num_cat"]), num_continuous=table["num_cont"],
        dim=args.dim, depth=args.depth, heads=args.heads,
        dim_head=max(args.dim // args.heads, 8))
    params = model.init(jax.random.key(args.seed),
                        jnp.asarray(cate[:1]), jnp.asarray(conti[:1]))
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, xc, xn, y, rng):
        def loss_fn(p):
            logits = model.apply(p, xc, xn, deterministic=False,
                                 rngs={"dropout": rng}).squeeze(-1)
            return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, y))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def predict(params, xc, xn):
        return jax.nn.sigmoid(model.apply(params, xc, xn).squeeze(-1))

    key = jax.random.key(args.seed + 1)
    for epoch in range(args.epochs):
        perm = rng.permutation(len(tr))
        losses = []
        for start in range(0, len(perm) - args.batch + 1, args.batch):
            idx = tr[perm[start:start + args.batch]]
            key, sub = jax.random.split(key)
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(cate[idx]),
                jnp.asarray(conti[idx]),
                jnp.asarray(labels[idx], jnp.float32), sub)
            losses.append(float(loss))
        if (epoch + 1) % args.log_every == 0 or epoch == args.epochs - 1:
            probs = predict(params, jnp.asarray(cate[te]),
                            jnp.asarray(conti[te]))
            m = binary_metrics(probs, jnp.asarray(labels[te]))
            print(f"epoch {epoch + 1}: loss={np.mean(losses):.4f} "
                  f"acc={float(m.accuracy):.4f} f1={float(m.f1):.4f} "
                  f"mcc={float(m.mcc):.4f}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--table_path", required=True)
    parser.add_argument("--epochs", type=int, default=50)
    parser.add_argument("--dim", type=int, default=32)
    parser.add_argument("--depth", type=int, default=6)
    parser.add_argument("--heads", type=int, default=8)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--split", type=float, default=0.8)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--log_every", type=int, default=10)
    main(parser.parse_args())
