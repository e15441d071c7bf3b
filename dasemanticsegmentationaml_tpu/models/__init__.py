"""Model zoo: STDC backbone, BiSeNet segmentation net, discriminators."""

from .stdcnet import ConvX, AddBottleneck, CatBottleneck, STDCNet813
from .bisenet import (
    ConvBNReLU,
    BiSeNetOutput,
    AttentionRefinementModule,
    ContextPath,
    FeatureFusionModule,
    BiSeNet,
)
from .discriminator import (
    FCDiscriminator,
    DepthWiseSepFCDiscriminator,
    DepthWiseSepBNFCDiscriminator,
    build_discriminator,
)

__all__ = [
    "ConvX",
    "AddBottleneck",
    "CatBottleneck",
    "STDCNet813",
    "ConvBNReLU",
    "BiSeNetOutput",
    "AttentionRefinementModule",
    "ContextPath",
    "FeatureFusionModule",
    "BiSeNet",
    "FCDiscriminator",
    "DepthWiseSepFCDiscriminator",
    "DepthWiseSepBNFCDiscriminator",
    "build_discriminator",
]
