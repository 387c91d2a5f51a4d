"""HF Jamba interop: import a (random-init, locally constructed)
transformers JambaForCausalLM into JambaLM and compare logits -- the
capability of the reference's from_pretrained (jamba.py:97-146) with a
real numerical parity check instead of name-copying."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gfe_mamba_tpu.models.jamba import JambaConfig, JambaLM
from gfe_mamba_tpu.utils.torch_import import import_jamba_hf


def test_jamba_hf_logit_parity():
    torch = pytest.importorskip("torch")
    try:
        from transformers import JambaConfig as HFJambaConfig
        from transformers import JambaForCausalLM
    except ImportError:
        pytest.skip("transformers lacks Jamba")

    hf_cfg = HFJambaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        mamba_d_state=8, mamba_d_conv=4, mamba_expand=2,
        num_experts=2, num_experts_per_tok=1,
        attn_layer_offset=1, attn_layer_period=2,
        expert_layer_offset=1, expert_layer_period=2,
        tie_word_embeddings=False, use_mamba_kernels=False,
    )
    torch.manual_seed(0)
    hf = JambaForCausalLM(hf_cfg).eval()
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}

    cfg = JambaConfig(
        d_model=32, n_layers=2, mlp_size=64, vocab_size=64,
        num_attention_heads=4, num_key_value_heads=2,
        d_state=8, d_conv=4, expand_factor=2,
        num_experts=2, num_experts_per_tok=1,
        attn_layer_offset=1, attn_layer_period=2,
        expert_layer_offset=1, expert_layer_period=2,
        dt_rank=hf_cfg.mamba_dt_rank, inner_layernorms=True,
        tie_lm_weights=False, rms_norm_eps=hf_cfg.rms_norm_eps,
    )
    model = JambaLM(cfg)
    tokens = np.asarray([[3, 17, 42, 5, 9, 30]], np.int64)
    variables = jax.eval_shape(model.init, jax.random.key(0),
                               jnp.asarray(tokens, jnp.int32))
    params = import_jamba_hf(state, variables["params"])

    with torch.no_grad():
        hf_logits = hf(torch.from_numpy(tokens)).logits.numpy()
    got, _ = model.apply({"params": params}, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), hf_logits, rtol=2e-3,
                               atol=2e-4)
