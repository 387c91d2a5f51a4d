"""Typed configuration tree + YAML loading.

One flat YAML (same keys as the reference's config/*.yaml, see
utils/common.py:127-146 in the reference) feeds both the trainer and the
runtime.  ``load_config`` preserves the reference behaviour of coercing
lists to tuples; ``get_parameters`` filters a dict down to a callable's
signature so a single YAML can parameterize several constructors.
"""

from __future__ import annotations

import dataclasses
import inspect
from dataclasses import dataclass, field
from typing import Any, Sequence

import yaml


def load_config(file_path: str) -> dict:
    """YAML -> dict with list->tuple coercion (reference common.py:127-138)."""
    with open(file_path, "r", encoding="utf-8") as f:
        config = yaml.safe_load(f)
    for key in config.keys():
        if isinstance(config[key], list):
            config[key] = tuple(config[key])
    return config


def get_parameters(fn, original_dict: dict) -> dict:
    """Filter ``original_dict`` to the keyword names accepted by ``fn``
    (reference common.py:140-146)."""
    params = inspect.signature(fn).parameters
    return {k: v for k, v in original_dict.items() if k in params}


def _from_flat(cls, flat: dict):
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in flat.items() if k in names})


@dataclass(frozen=True)
class GanVitConfig:
    """Stage-1 GAN-ViT training config (config/main_gan_vit_config.yaml)."""

    train_path: str = ""
    eval_path: str = ""
    train_bc: int = 1
    eval_bc: int = 1
    img_sz: Sequence[int] = (160, 160, 96)
    num_epochs: int = 200
    val_inter: int = 4
    save_inter: int = 5
    split_batches: bool = False
    mixed_precision: str = "bf16"  # TPU-native replacement for fp16 AMP
    log_with: str = "tensorboard"
    project_dir: str = "weights"
    gradient_accumulation_steps: int = 1
    is_debug: bool = False
    # model
    f_maps: Sequence[int] = (64, 128, 256)
    # losses / optimizers (main_gan_vit.py:43-46,50)
    adv_weight: float = 0.01
    perceptual_weight: float = 0.001
    lr_g: float = 1e-4
    lr_d: float = 5e-4
    warmup_epochs: int = 10
    grad_clip: float = 1.0
    seed: int = 0

    @classmethod
    def from_yaml(cls, path: str) -> "GanVitConfig":
        return _from_flat(cls, load_config(path))


@dataclass(frozen=True)
class ClassifyConfig:
    """Stage-2 classifier config (config/classify_mamba_config.yaml)."""

    train_path: str = ""
    eval_path: str = ""
    table_path: str = ""
    train_bc: int = 2
    eval_bc: int = 2
    img_sz: Sequence[int] = (160, 160, 96)
    num_epochs: int = 200
    days_threshold: int = -1
    val_inter: int = 1
    save_inter: int = 5
    resume_path: str = ""
    gan_ckpt: str = ""
    pth_dir: str = ""
    split_batches: bool = False
    mixed_precision: str = "bf16"
    log_with: str = "tensorboard"
    project_dir: str = "weights/classifier"
    gradient_accumulation_steps: int = 1
    is_debug: bool = False
    # classifier config
    latent_dim: int = 16
    f_maps: Sequence[int] = (64, 128, 256)
    seq_length: int = 4
    # ft_trans config (classify_mamba.py:40-50)
    dim: int = 512
    dim_out: int = 1
    depth: int = 6
    heads: int = 8
    attn_dropout: float = 0.1
    ff_dropout: float = 0.1
    mixer: str = "mamba"  # 'mamba' | 'jamba' | 'transformer'
    lr: float = 1e-4
    grad_clip: float = 1.0
    seed: int = 0

    @classmethod
    def from_yaml(cls, path: str) -> "ClassifyConfig":
        return _from_flat(cls, load_config(path))


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit/shard_map execution.

    axes: name -> size; -1 means "all remaining devices".  The default is
    pure data parallelism over every chip (the reference's only strategy,
    torch DDP -- main_gan_vit.py:31,54-56), but a ``model`` axis can be
    added for tensor-parallel sharding of the large ViT patch-embedding
    and cross-attention K/V projections.
    """

    data: int = -1
    model: int = 1
