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


# ---------------------------------------------------------------------------
# Vendored ViT zoo, 3D-capable members (vit_pytorch_diy/{vit_3d,
# simple_vit_3d, vivit, cct_3d}.py) -> gfe_mamba_tpu.models.vit_zoo[_extra]

def _vit_transformer_mapping(state_dict: Mapping[str, np.ndarray],
                             torch_prefix: str, flax_prefix: list) -> dict:
    """Vendored vit-style Transformer (vit_3d.py:63-76: layers.i.0 =
    Attention with in-block norm, layers.i.1 = FeedForward with leading
    LayerNorm) -> ViTTransformer attn_i/ff_i."""
    mapping: dict = {}
    for key in state_dict:
        m = re.match(rf"{re.escape(torch_prefix)}\.layers\."
                     r"(\d+)\.([01])\.(.*)", key)
        if not m:
            continue
        i, which, rest = int(m.group(1)), m.group(2), m.group(3)
        if which == "0":
            base = flax_prefix + [f"attn_{i}"]
            table = {
                "norm.weight": (base + ["norm", "scale"], None),
                "norm.bias": (base + ["norm", "bias"], None),
                "to_qkv.weight": (base + ["to_qkv", "kernel"], _linear),
                "to_out.0.weight": (base + ["to_out", "kernel"], _linear),
                "to_out.0.bias": (base + ["to_out", "bias"], None),
                # simple_vit flavor: bias-less plain Linear to_out
                # (simple_vit_3d.py:61); the flax Dense bias zero-fills
                "to_out.weight": (base + ["to_out", "kernel"], _linear),
            }
        else:
            base = flax_prefix + [f"ff_{i}"]
            table = {
                "net.0.weight": (base + ["LayerNorm_0", "scale"], None),
                "net.0.bias": (base + ["LayerNorm_0", "bias"], None),
                "net.1.weight": (base + ["Dense_0", "kernel"], _linear),
                "net.1.bias": (base + ["Dense_0", "bias"], None),
                "net.4.weight": (base + ["Dense_1", "kernel"], _linear),
                "net.4.bias": (base + ["Dense_1", "bias"], None),
                # simple_vit flavor: no dropouts, second Linear is net.3
                "net.3.weight": (base + ["Dense_1", "kernel"], _linear),
                "net.3.bias": (base + ["Dense_1", "bias"], None),
            }
        if rest in table:
            mapping[key] = table[rest]
    norm_key = f"{torch_prefix}.norm.weight"
    if norm_key in state_dict:
        mapping[norm_key] = (flax_prefix + ["norm", "scale"], None)
        mapping[f"{torch_prefix}.norm.bias"] = (
            flax_prefix + ["norm", "bias"], None)
    return mapping


def build_vit3d_mapping(state_dict: Mapping[str, np.ndarray],
                        grid: tuple) -> dict:
    """vit_3d.py ViT -> models.vit_zoo.ViT3D.

    The reference orders the patch grid (f h w) (vit_3d.py:93); ViT3D
    (channels-last (B, H, W, D, C)) orders it (h w f), so the learned
    pos_embedding rows are permuted here.  Its Transformer has no final
    norm and the head is LayerNorm+Linear (vit_3d.py:107-110); with cls
    pooling that LayerNorm commutes with token selection, so it lands on
    ViTTransformer's final ``norm``.  grid: (f, h, w) patch counts.
    """
    f, h, w = grid

    def _pos(p):
        cls, rest = p[:, :1], p[:, 1:]
        rest = rest.reshape(1, f, h, w, -1).transpose(0, 2, 3, 1, 4)
        return np.concatenate([cls, rest.reshape(1, f * h * w, -1)], axis=1)

    mapping = {
        "cls_token": (["cls_token"], None),
        "pos_embedding": (["pos_embedding"], _pos),
        "to_patch_embedding.1.weight": (["LayerNorm_0", "scale"], None),
        "to_patch_embedding.1.bias": (["LayerNorm_0", "bias"], None),
        "to_patch_embedding.2.weight": (["Dense_0", "kernel"], _linear),
        "to_patch_embedding.2.bias": (["Dense_0", "bias"], None),
        "to_patch_embedding.3.weight": (["LayerNorm_1", "scale"], None),
        "to_patch_embedding.3.bias": (["LayerNorm_1", "bias"], None),
        "mlp_head.0.weight": (["transformer", "norm", "scale"], None),
        "mlp_head.0.bias": (["transformer", "norm", "bias"], None),
        "mlp_head.1.weight": (["mlp_head", "kernel"], _linear),
        "mlp_head.1.bias": (["mlp_head", "bias"], None),
    }
    mapping.update(_vit_transformer_mapping(state_dict, "transformer",
                                            ["transformer"]))
    return mapping


def import_vit3d(state_dict, params_like, grid):
    return _import_with_mapping(state_dict, params_like,
                                build_vit3d_mapping(state_dict, grid))


def build_simple_vit3d_mapping(state_dict: Mapping[str, np.ndarray],
                               patch: tuple) -> dict:
    """simple_vit_3d.py SimpleViT -> models.vit_zoo_extra.SimpleViT3D.

    The reference lays each patch out (p1 p2 pf c) (simple_vit_3d.py:106)
    while SimpleViT3D packs (pf p1 p2 c), so every weight reading the
    patch axis is row-permuted.  patch: (p1, p2, pf, c) sizes.
    """
    p1, p2, pf, c = patch

    def _perm_vec(v):
        return v.reshape(p1, p2, pf, c).transpose(2, 0, 1, 3).reshape(-1)

    def _perm_linear(wt):  # torch (out, in) -> flax (in_permuted, out)
        out = wt.shape[0]
        wt = wt.reshape(out, p1, p2, pf, c).transpose(0, 3, 1, 2, 4)
        return np.transpose(wt.reshape(out, -1))

    mapping = {
        "to_patch_embedding.1.weight": (["patch_norm1", "scale"], _perm_vec),
        "to_patch_embedding.1.bias": (["patch_norm1", "bias"], _perm_vec),
        "to_patch_embedding.2.weight": (["patch_embed", "kernel"],
                                        _perm_linear),
        "to_patch_embedding.2.bias": (["patch_embed", "bias"], None),
        "to_patch_embedding.3.weight": (["patch_norm2", "scale"], None),
        "to_patch_embedding.3.bias": (["patch_norm2", "bias"], None),
        "linear_head.weight": (["linear_head", "kernel"], _linear),
        "linear_head.bias": (["linear_head", "bias"], None),
    }
    mapping.update(_vit_transformer_mapping(state_dict, "transformer",
                                            ["transformer"]))
    return mapping


def import_simple_vit3d(state_dict, params_like, patch):
    sd = dict(state_dict)
    mapping = build_simple_vit3d_mapping(sd, patch)
    # the reference's to_out Linears carry no bias; zero-fill ours
    for key in list(sd):
        m = re.match(r"transformer\.layers\.(\d+)\.0\.to_out\.weight", key)
        if m:
            zkey = f"__zeros__.to_out_bias.{m.group(1)}"
            sd[zkey] = np.zeros(sd[key].shape[0], np.float32)
            mapping[zkey] = (
                ["transformer", f"attn_{m.group(1)}", "to_out", "bias"],
                None)
    return _import_with_mapping(sd, params_like, mapping)


def build_vivit_mapping(state_dict: Mapping[str, np.ndarray]) -> dict:
    """vivit.py ViT (factorized spatial+temporal) ->
    models.vit_zoo_extra.ViViT.  Patch layout (p1 p2 pf c) and the
    (1, f, n, dim) pos table match 1:1 (vivit.py:110-119)."""
    mapping = {
        "pos_embedding": (["pos_embedding"], None),
        "to_patch_embedding.1.weight": (["patch_norm1", "scale"], None),
        "to_patch_embedding.1.bias": (["patch_norm1", "bias"], None),
        "to_patch_embedding.2.weight": (["patch_embed", "kernel"], _linear),
        "to_patch_embedding.2.bias": (["patch_embed", "bias"], None),
        "to_patch_embedding.3.weight": (["patch_norm2", "scale"], None),
        "to_patch_embedding.3.bias": (["patch_norm2", "bias"], None),
        "mlp_head.weight": (["mlp_head", "kernel"], _linear),
        "mlp_head.bias": (["mlp_head", "bias"], None),
    }
    for tok in ("spatial_cls_token", "temporal_cls_token"):
        if tok in state_dict:
            mapping[tok] = ([tok], None)
    for t in ("spatial_transformer", "temporal_transformer"):
        mapping.update(_vit_transformer_mapping(state_dict, t, [t]))
    return mapping


def import_vivit(state_dict, params_like):
    return _import_with_mapping(state_dict, params_like,
                                build_vivit_mapping(state_dict))


def build_cct_mapping(state_dict: Mapping[str, np.ndarray],
                      dims: int = 3) -> dict:
    """cct_3d.py / cct.py CCT -> models.vit_zoo_extra.CCT.

    Tokenizer convs are channels-first (O, I, *k) -> HWIO;
    TransformerEncoderLayer pre_norm/self_attn/norm1/linear1/linear2
    (cct_3d.py:114-142) -> pre_norm_i/attn_i/norm1_i/fc1_i/fc2_i; the
    'sine' positional buffer is recomputed, not imported."""
    conv = _conv if dims == 3 else (
        lambda w: np.transpose(w, (2, 3, 1, 0)))
    mapping: dict = {}
    for key in state_dict:
        m = re.match(r"tokenizer\.conv_layers\.(\d+)\.0\.weight", key)
        if m:
            mapping[key] = (
                ["tokenizer", f"conv_{m.group(1)}", "kernel"], conv)
        m = re.match(r"classifier\.blocks\.(\d+)\.(.*)", key)
        if not m:
            continue
        i, rest = int(m.group(1)), m.group(2)
        table = {
            "pre_norm.weight": ([f"pre_norm_{i}", "scale"], None),
            "pre_norm.bias": ([f"pre_norm_{i}", "bias"], None),
            "self_attn.qkv.weight": ([f"attn_{i}", "qkv", "kernel"],
                                     _linear),
            "self_attn.proj.weight": ([f"attn_{i}", "proj", "kernel"],
                                      _linear),
            "self_attn.proj.bias": ([f"attn_{i}", "proj", "bias"], None),
            "norm1.weight": ([f"norm1_{i}", "scale"], None),
            "norm1.bias": ([f"norm1_{i}", "bias"], None),
            "linear1.weight": ([f"fc1_{i}", "kernel"], _linear),
            "linear1.bias": ([f"fc1_{i}", "bias"], None),
            "linear2.weight": ([f"fc2_{i}", "kernel"], _linear),
            "linear2.bias": ([f"fc2_{i}", "bias"], None),
        }
        if rest in table:
            mapping[key] = table[rest]
    tail = {
        "classifier.attention_pool.weight": (["attention_pool", "kernel"],
                                             _linear),
        "classifier.attention_pool.bias": (["attention_pool", "bias"], None),
        "classifier.class_emb": (["class_emb"], None),
        "classifier.positional_emb": (["pos_embedding"], None),
        "classifier.norm.weight": (["final_norm", "scale"], None),
        "classifier.norm.bias": (["final_norm", "bias"], None),
        "classifier.fc.weight": (["fc", "kernel"], _linear),
        "classifier.fc.bias": (["fc", "bias"], None),
    }
    mapping.update({k: v for k, v in tail.items() if k in state_dict})
    # a 'sine' positional_emb is a registered buffer, recomputed in flax
    if "classifier.positional_emb" in mapping and \
            "classifier.attention_pool.weight" in state_dict:
        pe = state_dict["classifier.positional_emb"]
        npos = pe.shape[1]
        sine = np.array(
            [[p / 10000.0 ** (2 * (i // 2) / pe.shape[2])
              for i in range(pe.shape[2])] for p in range(npos)], np.float32)
        sine[:, 0::2] = np.sin(sine[:, 0::2])
        sine[:, 1::2] = np.cos(sine[:, 1::2])
        if np.allclose(pe, sine[None], atol=1e-5):
            del mapping["classifier.positional_emb"]
    return mapping


def import_cct(state_dict, params_like, dims: int = 3):
    return _import_with_mapping(state_dict, params_like,
                                build_cct_mapping(state_dict, dims))
