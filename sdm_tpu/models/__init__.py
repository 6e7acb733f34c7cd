from sdm_tpu.models.unet import UNet
from sdm_tpu.models.layers import (
    swish,
    AdaGN,
    ConditionalEmbedding,
    AttentionBlock,
    UpsampleBlock,
    DownsampleBlock,
    UNetConvBlock,
    ResidualBlock,
    UNetBlock,
)
