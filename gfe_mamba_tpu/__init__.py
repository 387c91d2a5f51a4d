"""GFE-Mamba TPU: a TPU-native (JAX/XLA/Pallas) framework for MCI->AD
conversion prediction from multimodal 3D MRI + tabular clinical data.

Brand-new re-design of the capabilities of the GFE-Mamba reference
(Tinysqua/GFE-Mamba): a two-stage pipeline

  1. Stage 1 -- generative feature extractor: a 3D residual UNet with an
     image-to-image ViT bottleneck, adversarially trained to translate
     MRI -> PET (PatchGAN + L1 + perceptual losses).
  2. Stage 2 -- multimodal Mamba classifier: frozen Stage-1 ViT-bottleneck
     features + FT-Transformer tabular embeddings fused by a selective
     state-space (Mamba) mixer and a pixel-level cross-attention over the
     raw MRI and generated PET volumes.

All models are flax.linen modules operating on channels-LAST tensors
(B, *spatial, C) -- the idiomatic XLA/TPU layout -- and every hot op is
designed to map onto the MXU (large batched matmuls, fused 3D convs,
associative-scan SSM).
"""

__version__ = "0.1.0"

from gfe_mamba_tpu import config  # noqa: F401
