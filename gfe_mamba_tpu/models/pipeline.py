"""End-to-end GFE-Mamba pipeline: the flagship inference model.

Composes the three Stage-2 pieces exactly as the reference training/eval
loops do (classify_mamba.py:100-103, test_mamba.py:82-85):

    mid_input, mid_output, pet = generator(mri, output_vit_mid=True)
    feature   = combiner(mid_input, mid_output)
    logit     = classifier(x_categ, x_numer, feature, [mri, pet])

into ONE jittable module, so the full MRI -> conversion-logit path
(3D convs + ViT + Mamba scan + 25600-wide cross-attention) compiles to
a single fused XLA program per batch.  The generator always runs
deterministic (frozen / eval mode, classify_mamba.py:53).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from gfe_mamba_tpu.models.combiners import CombineClassifierVitMid
from gfe_mamba_tpu.models.fusion import CrossJambaBoth, CrossMambaBoth
from gfe_mamba_tpu.models.unet3d import ResidualMidUNet3DViT, UNet

Array = jnp.ndarray


class GFEMamba(nn.Module):
    """generator (frozen) -> combiner -> fusion classifier."""

    generator: UNet
    combiner: nn.Module
    classifier: nn.Module

    def __call__(self, mri: Array, x_categ: Array, x_numer: Array, *,
                 deterministic: bool = True,
                 return_pet: bool = False):
        mid_input, mid_output, pet = self.generator(
            mri, output_vit_mid=True)
        feature_img = self.combiner(mid_input, mid_output)
        logits = self.classifier(
            x_categ, x_numer, feature_img, [mri, pet],
            deterministic=deterministic)
        if return_pet:
            return logits, pet
        return logits


def build_gfe_mamba(*, categories: Sequence[int], num_continuous: int,
                    dim: int = 512, depth: int = 6, heads: int = 8,
                    dim_out: int = 1, attn_dropout: float = 0.1,
                    ff_dropout: float = 0.1, seq_length: int = 4,
                    f_maps: Sequence[int] = (64, 128, 256),
                    mixer: str = "mamba", scan_mode: str = "associative",
                    **gen_kwargs) -> GFEMamba:
    """Build the canonical pipeline from the classify config keys
    (classify_mamba.py:36-56)."""
    generator = ResidualMidUNet3DViT(
        1, 1, is_segmentation=False, f_maps=tuple(f_maps), **gen_kwargs)
    combiner = CombineClassifierVitMid(seq_length=seq_length)
    cls_kwargs = dict(
        categories=tuple(categories), num_continuous=num_continuous,
        dim=dim, depth=depth, heads=heads, dim_head=dim // heads,
        dim_out=dim_out, attn_dropout=attn_dropout, ff_dropout=ff_dropout,
        scan_mode=scan_mode,
    )
    if mixer == "mamba":
        classifier = CrossMambaBoth(**cls_kwargs)
    elif mixer == "jamba":
        classifier = CrossJambaBoth(**cls_kwargs)
    elif mixer == "transformer":
        # transformer-mixer twin (Cross_transformer_both; the legacy
        # classify_cross_atten.py entry's model)
        from gfe_mamba_tpu.models.ft_transformer import CrossTransformerBoth
        cls_kwargs.pop("scan_mode")
        classifier = CrossTransformerBoth(**cls_kwargs)
    else:
        raise ValueError(f"unknown mixer {mixer!r}")
    return GFEMamba(generator=generator, combiner=combiner,
                    classifier=classifier)
