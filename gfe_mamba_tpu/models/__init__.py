from gfe_mamba_tpu.models.vit import ImageToImageViT, ViTTransformer
from gfe_mamba_tpu.models.unet3d import (
    UNet,
    UNet3D,
    ResidualUNet3D,
    ResidualUNetSE3D,
    UNet2D,
    ResidualUNet2D,
    ResidualMidUNet3D,
    ResidualMidUNet3DViT,
    get_model,
)
