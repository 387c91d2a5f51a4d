"""Jamba tests: layer interleave rule, GQA attention, MoE dispatch
equivalence against a literal per-expert loop, aux loss, LM step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gfe_mamba_tpu.models.jamba import (
    GQAttention, Jamba, JambaConfig, JambaLM, SparseMoEBlock,
    load_balancing_loss,
)

CFG = JambaConfig(d_model=16, n_layers=5, mlp_size=16,
                  num_attention_heads=4, num_key_value_heads=2,
                  num_experts=4, num_experts_per_tok=2,
                  attn_layer_offset=4, attn_layer_period=8,
                  expert_layer_offset=1, expert_layer_period=2)


def test_layer_interleave_rule():
    """(i - offset) % period == 0 (jamba.py:268-270)."""
    attn_layers = [i for i in range(CFG.n_layers) if CFG.is_attn_layer(i)]
    expert_layers = [i for i in range(CFG.n_layers) if CFG.is_expert_layer(i)]
    assert attn_layers == [4]
    assert expert_layers == [1, 3]


def test_forward_and_router_logits():
    model = Jamba(CFG)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 16), jnp.float32)
    params = model.init(jax.random.key(0), x)
    y, router_logits = model.apply(params, x)
    assert y.shape == x.shape
    assert len(router_logits) == CFG.n_layers
    # expert layers expose (B*L, E); dense layers (B*L, 1)
    assert router_logits[1].shape == (10, 4)
    assert router_logits[0].shape == (10, 1)


def test_moe_dense_dispatch_matches_per_expert_loop():
    """The dense einsum dispatch must equal the reference's sparse
    per-expert gather/scatter computation (jamba.py:478-514)."""
    m = SparseMoEBlock(num_experts=4, num_experts_per_tok=2, mlp_size=8)
    x = jnp.asarray(np.random.RandomState(1).randn(2, 5, 6), jnp.float32)
    params = m.init(jax.random.key(0), x)
    out, router_logits = m.apply(params, x)

    # reference semantics in numpy
    p = jax.tree_util.tree_map(np.asarray, params["params"])
    xf = np.asarray(x).reshape(-1, 6)
    logits = xf @ p["router"]["kernel"]
    w = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    order = np.argsort(-w, axis=-1)[:, :2]
    expected = np.zeros_like(xf)
    for t in range(xf.shape[0]):
        for j in range(2):
            e = order[t, j]
            h = xf[t] @ p["experts_gate"][e]
            u = xf[t] @ p["experts_up"][e]
            y = (h / (1 + np.exp(-h)) * u) @ p["experts_down"][e]
            expected[t] += w[t, e] * y
    np.testing.assert_allclose(np.asarray(out).reshape(-1, 6), expected,
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(router_logits), logits,
                               rtol=2e-3, atol=2e-3)


def test_gqa_attention_causal_and_cache():
    m = GQAttention(CFG)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 6, 16), jnp.float32)
    params = m.init(jax.random.key(0), x)
    y_full, _ = m.apply(params, x)
    # causal: prefix invariance
    y_trunc, _ = m.apply(params, x[:, :4])
    np.testing.assert_allclose(np.asarray(y_full[:, :4]),
                               np.asarray(y_trunc), rtol=1e-4, atol=1e-5)
    # KV-cache stepping matches full causal attention
    cache = (None, None)
    outs = []
    for t in range(6):
        y_t, cache = m.apply(params, x[:, t:t + 1], cache)
        outs.append(y_t)
    y_step = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_step), np.asarray(y_full),
                               rtol=1e-4, atol=1e-4)


def test_jamba_step_matches_forward():
    model = Jamba(CFG)
    x = jnp.asarray(np.random.RandomState(3).randn(2, 5, 16), jnp.float32)
    params = model.init(jax.random.key(0), x)
    y_full, _ = model.apply(params, x)

    caches = model.init_cache(batch=2)
    outs = []
    for t in range(5):
        y_t, caches = model.apply(params, x[:, t:t + 1], caches,
                                  method=Jamba.step)
        outs.append(y_t)
    y_step = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(y_step), np.asarray(y_full),
                               rtol=5e-4, atol=5e-4)


def test_load_balancing_loss_uniform_router():
    # uniform router: tokens_per_expert is one-hot per top-k slot, prob
    # per expert is 1/E -> loss = k (jamba.py:537-555 formula)
    logits = [jnp.zeros((40, 4))]
    loss = load_balancing_loss(logits, num_experts=4, num_experts_per_tok=2)
    np.testing.assert_allclose(float(loss), 2.0, rtol=1e-5)


def test_jamba_lm_forward_and_step():
    cfg = JambaConfig(d_model=16, n_layers=2, mlp_size=32, vocab_size=50,
                      num_attention_heads=4, num_key_value_heads=2,
                      num_experts=2, num_experts_per_tok=1,
                      attn_layer_offset=0, attn_layer_period=2)
    model = JambaLM(cfg)
    tokens = jnp.asarray([[3, 7, 1, 4]], jnp.int32)
    params = model.init(jax.random.key(0), tokens)
    logits, _ = model.apply(params, tokens)
    assert logits.shape == (1, 4, 50)

    caches = Jamba(cfg).init_cache(batch=1)
    step_logits = []
    for t in range(4):
        lg, caches = model.apply(params, tokens[:, t], caches,
                                 method=JambaLM.step)
        step_logits.append(lg)
    step_logits = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(np.asarray(step_logits), np.asarray(logits),
                               rtol=5e-4, atol=5e-4)
