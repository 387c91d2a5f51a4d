from gfe_mamba_tpu.models.vit import ImageToImageViT, ViTTransformer
from gfe_mamba_tpu.models.attention import SelfAttention, CrossAttention
from gfe_mamba_tpu.models.mamba import Mamba, MambaConfig
from gfe_mamba_tpu.models.ft_transformer import (
    FTTransformerEncoder,
    TransformerCross,
    NumericalEmbedder,
    TabularEmbedder,
    CrossTransformerBoth,
    CrossTransformer,
    FTTransformerCrossImg,
    FTTransformerCross,
)
from gfe_mamba_tpu.models.fusion import (
    CrossMambaBoth,
    CrossJambaBoth,
    CrossMambaAblation,
)
from gfe_mamba_tpu.models.combiners import CombineClassifierVitMid, CombinePyramid
from gfe_mamba_tpu.models.jamba import (
    Jamba,
    JambaConfig,
    JambaLM,
    SparseMoEBlock,
    load_balancing_loss,
)
from gfe_mamba_tpu.models.pipeline import GFEMamba, build_gfe_mamba
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
