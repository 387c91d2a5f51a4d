from gfe_mamba_tpu.ops.blocks import (
    SingleConv,
    DoubleConv,
    ResNetBlock,
    ResNetBlockSE,
    Encoder,
    Decoder,
    make_encoder_stack,
    make_decoder_stack,
    ChannelSELayer,
    SpatialSELayer,
    ChannelSpatialSELayer,
)
from gfe_mamba_tpu.ops.volumetric import (
    adaptive_normal,
    scale_intensity_range,
    resize_volume,
    crop_foreground,
)
from gfe_mamba_tpu.ops.scan import (
    linear_recurrence,
    selective_scan,
    selective_scan_step,
)
