"""Import reference (torch) checkpoints into the flax generator.

Maps a ``Residual_mid_UNet3D_vit`` state_dict (the Stage-1 GAN
checkpoint the reference saves at main_gan_vit.py:131-134) onto this
framework's ``ResidualMidUNet3DViT`` parameter tree, so users can bring
trained reference weights across without retraining:

* Conv3d        (O, I, kx, ky, kz) -> kernel (kx, ky, kz, I, O)
* ConvTranspose3d (I, O, kx, ky, kz) -> kernel (kx, ky, kz, I, O),
  spatially flipped (torch's transposed conv correlates with the
  flipped kernel relative to lax.conv_transpose)
* Linear        (O, I) -> kernel (I, O)
* LayerNorm / GroupNorm weight/bias -> scale/bias

Build the flax model with ``exact_reference_upsample=True`` for
numerical parity (the default decoder uses even-size deconv padding).
The dead ``mid_linear`` layer (model.py:119) is ignored.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _conv(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def _deconv(w):
    # (I, O, kx, ky, kz) -> flip spatial -> (kx, ky, kz, I, O)
    return np.transpose(w[:, :, ::-1, ::-1, ::-1], (2, 3, 4, 0, 1)).copy()


def _linear(w):
    return np.transpose(w)


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    import torch
    state = torch.load(path, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return {k: v.detach().numpy() for k, v in state.items()}


def build_generator_mapping(state_dict: Mapping[str, np.ndarray]) -> dict:
    """state_dict key -> (flax param path, transform)."""
    mapping: dict = {}

    # encoder / decoder ResNetBlocks
    for key in state_dict:
        m = re.match(r"(encoders|decoders)\.(\d+)\.basic_module\.(.*)", key)
        if not m:
            continue
        stack = "encoder" if m.group(1) == "encoders" else "decoder"
        idx = int(m.group(2))
        rest = m.group(3)
        base = [f"{stack}_{idx}", "basic_module"]
        if rest == "conv1.weight":
            mapping[key] = (base + ["conv1", "kernel"], _conv)
        elif rest == "conv1.bias":
            mapping[key] = (base + ["conv1", "bias"], None)
        elif rest.startswith("conv2.") or rest.startswith("conv3."):
            sub = rest.split(".")[0]
            inner = rest.split(".", 1)[1]
            if inner == "conv.weight":
                mapping[key] = (base + [sub, "conv", "kernel"], _conv)
            elif inner == "groupnorm.weight":
                # the groupnorm's index suffix depends on the order
                # string ('gcr' -> groupnorm_0, 'cge' -> groupnorm_1);
                # resolved against the target tree at fill time
                mapping[key] = (base + [sub, "groupnorm_*", "scale"], None)
            elif inner == "groupnorm.bias":
                mapping[key] = (base + [sub, "groupnorm_*", "bias"], None)

    # decoder transposed convs
    for key in state_dict:
        m = re.match(
            r"decoders\.(\d+)\.upsampling\.upsample\.conv_transposed\.weight",
            key)
        if m:
            mapping[key] = (
                [f"decoder_{m.group(1)}", "upsampling", "kernel"], _deconv)

    # final conv
    mapping["final_conv.weight"] = (["final_conv", "kernel"], _conv)
    mapping["final_conv.bias"] = (["final_conv", "bias"], None)

    # ViT bottleneck (model.py:107-117, vit.py:83-137)
    vit = {
        "mid.cls_token": (["mid", "cls_token"], None),
        "mid.pos_embedding": (["mid", "pos_embedding"], None),
        "mid.to_patch_embedding.1.weight": (["mid", "patch_norm_in", "scale"], None),
        "mid.to_patch_embedding.1.bias": (["mid", "patch_norm_in", "bias"], None),
        "mid.to_patch_embedding.2.weight": (["mid", "patch_embed", "kernel"], _linear),
        "mid.to_patch_embedding.2.bias": (["mid", "patch_embed", "bias"], None),
        "mid.to_patch_embedding.3.weight": (["mid", "patch_norm_out", "scale"], None),
        "mid.to_patch_embedding.3.bias": (["mid", "patch_norm_out", "bias"], None),
        "mid.transformer.norm.weight": (["mid", "transformer", "norm", "scale"], None),
        "mid.transformer.norm.bias": (["mid", "transformer", "norm", "bias"], None),
        "mid.from_patch_embedding.0.weight": (["mid", "out_norm_tokens", "scale"], None),
        "mid.from_patch_embedding.0.bias": (["mid", "out_norm_tokens", "bias"], None),
        "mid.from_patch_embedding.2.weight": (["mid", "token_mix", "kernel"], _linear),
        "mid.from_patch_embedding.2.bias": (["mid", "token_mix", "bias"], None),
        "mid.from_patch_embedding.4.weight": (["mid", "patch_unembed", "kernel"], _linear),
        "mid.from_patch_embedding.4.bias": (["mid", "patch_unembed", "bias"], None),
        "mid.from_patch_embedding.5.weight": (["mid", "out_norm_patch", "scale"], None),
        "mid.from_patch_embedding.5.bias": (["mid", "out_norm_patch", "bias"], None),
    }
    mapping.update({k: v for k, v in vit.items() if k in state_dict})

    for key in state_dict:
        m = re.match(r"mid\.transformer\.layers\.(\d+)\.([01])\.(.*)", key)
        if not m:
            continue
        i, which, rest = int(m.group(1)), m.group(2), m.group(3)
        if which == "0":  # attention
            base = ["mid", "transformer", f"attn_{i}"]
            table = {
                "norm.weight": (base + ["norm", "scale"], None),
                "norm.bias": (base + ["norm", "bias"], None),
                "to_qkv.weight": (base + ["to_qkv", "kernel"], _linear),
                "to_out.0.weight": (base + ["to_out", "kernel"], _linear),
                "to_out.0.bias": (base + ["to_out", "bias"], None),
            }
        else:  # feedforward: net.0 LN, net.1 Dense, net.4 Dense
            base = ["mid", "transformer", f"ff_{i}"]
            table = {
                "net.0.weight": (base + ["LayerNorm_0", "scale"], None),
                "net.0.bias": (base + ["LayerNorm_0", "bias"], None),
                "net.1.weight": (base + ["Dense_0", "kernel"], _linear),
                "net.1.bias": (base + ["Dense_0", "bias"], None),
                "net.4.weight": (base + ["Dense_1", "kernel"], _linear),
                "net.4.bias": (base + ["Dense_1", "bias"], None),
            }
        if rest in table:
            mapping[key] = table[rest]
    return mapping


def import_generator(state_dict: Mapping[str, np.ndarray],
                     params_like: Any) -> Any:
    """Convert a reference generator state_dict into a params tree
    shaped like ``params_like`` (the flax model's ['params'] subtree).

    Raises on any missing/mismatched parameter so silent partial imports
    cannot happen."""
    import jax

    mapping = build_generator_mapping(state_dict)
    out = _tree_to_dict(params_like)

    filled = set()
    for torch_key, (path, transform) in mapping.items():
        if torch_key not in state_dict:
            raise KeyError(f"state_dict missing {torch_key}")
        value = np.asarray(state_dict[torch_key])
        if transform is not None:
            value = transform(value)
        node = out
        resolved = []
        for part in path[:-1]:
            if part.endswith("*"):
                prefix = part[:-1]
                candidates = [k for k in node if k.startswith(prefix)]
                if len(candidates) != 1:
                    raise KeyError(
                        f"cannot resolve {part!r} under "
                        f"{'/'.join(resolved)}: {candidates}")
                part = candidates[0]
            node = node[part]
            resolved.append(part)
        path = resolved + [path[-1]]
        want = np.shape(node[path[-1]])
        if tuple(value.shape) != tuple(want):
            raise ValueError(
                f"{torch_key} -> {'/'.join(path)}: shape {value.shape} "
                f"!= expected {want}")
        node[path[-1]] = value.astype(np.float32)
        filled.add("/".join(path))

    # every flax param must have been filled
    missing = []
    for keypath, leaf in jax.tree_util.tree_leaves_with_path(params_like):
        name = "/".join(str(getattr(k, "key", k)) for k in keypath)
        if name not in filled:
            missing.append(name)
    if missing:
        raise KeyError(f"unmapped flax params: {missing[:8]}"
                       + ("..." if len(missing) > 8 else ""))
    return out


def _tree_to_dict(tree):
    if isinstance(tree, Mapping):
        return {k: _tree_to_dict(v) for k, v in tree.items()}
    return tree


def _conv1d_depthwise(w):
    # torch depthwise Conv1d (ED, 1, k) -> flax (k, 1, ED)
    return np.transpose(w, (2, 1, 0))


def build_classifier_mapping(state_dict: Mapping[str, np.ndarray]) -> dict:
    """Cross_mamba_both state_dict -> CrossMambaBoth param paths
    (mamba_transformer.py:11-133 + mamba.py module tree)."""
    mapping: dict = {
        "cls_token": (["embed", "cls_token"], None),
        "categorical_embeds.weight": (
            ["embed", "categorical_embeds", "embedding"], None),
        "numerical_embedder.weights": (
            ["embed", "numerical_embedder", "weights"], None),
        "numerical_embedder.biases": (
            ["embed", "numerical_embedder", "biases"], None),
        "to_logits.0.weight": (["to_logits", "LayerNorm_0", "scale"], None),
        "to_logits.0.bias": (["to_logits", "LayerNorm_0", "bias"], None),
        "to_logits.1.weight": (["to_logits", "Dense_0", "kernel"], _linear),
        "to_logits.1.bias": (["to_logits", "Dense_0", "bias"], None),
        "final_feed.0.weight": (["final_feed", "LayerNorm_0", "scale"], None),
        "final_feed.0.bias": (["final_feed", "LayerNorm_0", "bias"], None),
        "final_feed.1.weight": (["final_feed", "Dense_0", "kernel"], _linear),
        "final_feed.1.bias": (["final_feed", "Dense_0", "bias"], None),
        "final_feed.4.weight": (["final_feed", "Dense_1", "kernel"], _linear),
        "final_feed.4.bias": (["final_feed", "Dense_1", "bias"], None),
    }
    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        mapping[f"final_cross.{proj}.weight"] = (
            ["final_cross", proj, "kernel"], _linear)
        mapping[f"final_cross.{proj}.bias"] = (
            ["final_cross", proj, "bias"], None)

    for key in state_dict:
        m = re.match(r"transformer\.layers\.(\d+)\.(mixer|norm)\.(.*)", key)
        if not m:
            continue
        i, part, rest = int(m.group(1)), m.group(2), m.group(3)
        base = ["transformer", f"layer_{i}"]
        if part == "norm" and rest == "weight":
            mapping[key] = (base + ["norm", "weight"], None)
            continue
        base = base + ["mixer"]
        table = {
            "A_log": (base + ["A_log"], None),
            "D": (base + ["D"], None),
            "in_proj.weight": (base + ["in_proj", "kernel"], _linear),
            "in_proj.bias": (base + ["in_proj", "bias"], None),
            "conv1d.weight": (base + ["conv1d", "kernel"], _conv1d_depthwise),
            "conv1d.bias": (base + ["conv1d", "bias"], None),
            "x_proj.weight": (base + ["x_proj", "kernel"], _linear),
            "dt_proj.weight": (base + ["dt_proj_kernel"], _linear),
            "dt_proj.bias": (base + ["dt_proj_bias"], None),
            "out_proj.weight": (base + ["out_proj", "kernel"], _linear),
            "out_proj.bias": (base + ["out_proj", "bias"], None),
        }
        if rest in table:
            mapping[key] = table[rest]
    return mapping


def build_combiner_mapping(state_dict: Mapping[str, np.ndarray]) -> dict:
    """Combine_classfier_vit_mid (classifier.py:324-333)."""
    return {
        "vit_mid_linear.weight": (["vit_mid_linear", "kernel"], _linear),
        "vit_mid_linear.bias": (["vit_mid_linear", "bias"], None),
    }


def _import_with_mapping(state_dict, params_like, mapping,
                         ignore: tuple = ()) -> Any:
    import jax

    out = _tree_to_dict(params_like)
    filled = set()
    for torch_key, (path, transform) in mapping.items():
        if torch_key not in state_dict:
            raise KeyError(f"state_dict missing {torch_key}")
        value = np.asarray(state_dict[torch_key])
        if transform is not None:
            value = transform(value)
        node = out
        for part in path[:-1]:
            node = node[part]
        want = np.shape(node[path[-1]])
        if tuple(value.shape) != tuple(want):
            raise ValueError(
                f"{torch_key} -> {'/'.join(path)}: shape {value.shape} "
                f"!= expected {want}")
        node[path[-1]] = value.astype(np.float32)
        filled.add("/".join(path))

    missing = []
    for keypath, _ in jax.tree_util.tree_leaves_with_path(params_like):
        name = "/".join(str(getattr(k, "key", k)) for k in keypath)
        if name not in filled and not name.startswith(ignore):
            missing.append(name)
    if missing:
        raise KeyError(f"unmapped flax params: {missing[:8]}"
                       + ("..." if len(missing) > 8 else ""))
    return out


def import_classifier(state_dict: Mapping[str, np.ndarray],
                      params_like: Any) -> Any:
    """Cross_mamba_both checkpoint -> CrossMambaBoth params."""
    return _import_with_mapping(state_dict, params_like,
                                build_classifier_mapping(state_dict))


def import_combiner(state_dict: Mapping[str, np.ndarray],
                    params_like: Any) -> Any:
    """Combine_classfier_vit_mid checkpoint -> CombineClassifierVitMid."""
    return _import_with_mapping(state_dict, params_like,
                                build_combiner_mapping(state_dict))


def build_jamba_hf_mapping(state_dict: Mapping[str, np.ndarray]) -> dict:
    """HF Jamba (ai21labs/Jamba-v0.1 naming, transformers JambaModel)
    state_dict -> JambaLM params -- the capability of the reference's
    ``from_pretrained`` (jamba.py:97-146), operating on a LOCAL
    checkpoint (this environment has no network egress).

    Expert weights stack into the (E, d, f) EP-shardable tensors used by
    the dense-dispatch MoE (see models/jamba.py)."""
    mapping: dict = {
        "model.embed_tokens.weight": (["embedding", "embedding"], None),
        "model.final_layernorm.weight": (["final_layernorm", "weight"], None),
    }
    if "lm_head.weight" in state_dict:
        mapping["lm_head.weight"] = (["lm_head", "kernel"], _linear)

    # stacked expert tensors need a gather across keys; handled by the
    # caller via _stack_experts -- here we map everything per-key
    for key in state_dict:
        m = re.match(r"model\.layers\.(\d+)\.(.*)", key)
        if not m:
            continue
        i, rest = int(m.group(1)), m.group(2)
        base = ["jamba", f"layer_{i}"]
        if rest == "input_layernorm.weight":
            mapping[key] = (base + ["input_layernorm", "weight"], None)
        elif rest == "pre_ff_layernorm.weight":
            mapping[key] = (base + ["pre_moe_layernorm", "weight"], None)
        elif rest.startswith("self_attn."):
            proj = rest.split(".")[1]
            mapping[key] = (base + ["self_attn", proj, "kernel"], _linear)
        elif rest.startswith("mamba."):
            inner = rest.split(".", 1)[1]
            mbase = base + ["mamba"]
            table = {
                "A_log": (mbase + ["A_log"], None),
                "D": (mbase + ["D"], None),
                "in_proj.weight": (mbase + ["in_proj", "kernel"], _linear),
                "in_proj.bias": (mbase + ["in_proj", "bias"], None),
                "conv1d.weight": (mbase + ["conv1d", "kernel"],
                                  _conv1d_depthwise),
                "conv1d.bias": (mbase + ["conv1d", "bias"], None),
                "x_proj.weight": (mbase + ["x_proj", "kernel"], _linear),
                "dt_proj.weight": (mbase + ["dt_proj_kernel"], _linear),
                "dt_proj.bias": (mbase + ["dt_proj_bias"], None),
                "out_proj.weight": (mbase + ["out_proj", "kernel"], _linear),
                "out_proj.bias": (mbase + ["out_proj", "bias"], None),
                "dt_layernorm.weight": (mbase + ["dt_layernorm", "weight"],
                                        None),
                "b_layernorm.weight": (mbase + ["B_layernorm", "weight"],
                                       None),
                "c_layernorm.weight": (mbase + ["C_layernorm", "weight"],
                                       None),
            }
            if inner in table:
                mapping[key] = table[inner]
        elif rest == "feed_forward.router.weight":
            mapping[key] = (base + ["moe", "router", "kernel"], _linear)
        elif re.match(r"feed_forward\.(gate|up|down)_proj\.weight", rest):
            # dense (single-expert) layer
            proj = rest.split(".")[1]
            mapping[key] = (base + ["moe", "expert", proj, "kernel"],
                            _linear)
    return mapping


def _stack_hf_experts(state_dict: Mapping[str, np.ndarray]) -> dict:
    """layers.i.feed_forward.experts.e.{gate,up,down}_proj.weight ->
    stacked (E, d, f) arrays keyed for the flax tree."""
    groups: dict = {}
    for key, value in state_dict.items():
        m = re.match(
            r"model\.layers\.(\d+)\.feed_forward\.experts\.(\d+)\."
            r"(gate|up|down)_proj\.weight", key)
        if not m:
            continue
        i, e, proj = int(m.group(1)), int(m.group(2)), m.group(3)
        groups.setdefault((i, proj), {})[e] = np.transpose(value)  # (d, f)
    stacked = {}
    for (i, proj), experts in groups.items():
        arrs = [experts[e] for e in sorted(experts)]
        stacked[(f"layer_{i}", f"experts_{proj}")] = np.stack(arrs)
    return stacked


def import_jamba_hf(state_dict: Mapping[str, np.ndarray],
                    params_like: Any) -> Any:
    """HF Jamba checkpoint dict -> JambaLM params."""
    sd = dict(state_dict)
    mapping = build_jamba_hf_mapping(sd)
    for (layer, name), value in _stack_hf_experts(sd).items():
        key = f"__stacked__.{layer}.{name}"
        sd[key] = value
        mapping[key] = (["jamba", layer, "moe", name], None)
    return _import_with_mapping(sd, params_like, mapping)
