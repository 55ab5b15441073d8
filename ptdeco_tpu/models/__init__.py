from .mlp import MLP, make_mlp
from .moe_stack import StackedMoEMLP, stack_moe_experts, unstack_moe_experts
from .convnext import ConvNeXt, convnext_small, convnext_tiny, convnextv2_tiny
from .efficientformer import (
    EfficientFormerV1,
    EfficientFormerV2,
    efficientformerv2_s0,
    efficientformerv2_s1,
)
from .efficientnet import EfficientNet, efficientnet_b0
from .bit import BiT
from .clip_vit import ClipClassifier, SiglipClassifier
from .cvt import CvT
from .hiera import Hiera
from .levit import LeViT
from .focalnet import FocalNet
from .pvt import PVT, PVTv2, Segformer
from .swiftformer import SwiftFormer
from .hgnet import HGNetV2
from .textnet import TextNet
from .van import VAN
from .resnet import ResNet, resnet18, resnet34, resnet50, resnet101
from .regnet import RegNet, regnet_y_tiny
from .mobilenet import MobileNetV1, MobileNetV2, mobilenet_v2_tiny
from .mobilevit import MobileViT, MobileViTV2
from .perceiver import PerceiverImageClassifierLearned
from .poolformer import PoolFormer, poolformer_s12
from .phi import PhiCausalLM, PhiConfig
from .swin import (SwinV2, swinv2_cr_small_ns, swinv2_cr_tiny_ns,
                   swinv2_small, swinv2_tiny)
from .vit import ViT, vit_base, vit_small, vit_tiny, deit_small, dinov2_small
from .ssm import (
    Mamba1Mixer,
    Mamba2Mixer,
    MambaBlock,
    MambaConfig,
    MambaLM,
    RwkvConfig,
    RwkvLM,
    ZambaConfig,
    ZambaLM,
)
from .cpmant import CpmAntConfig, CpmAntLM
from .prophetnet import ProphetNetConfig, ProphetNetLM
from .blt import BltConfig, BltLM
from .mega import MegaConfig, MegaLM
from .reformer import ReformerConfig, ReformerLM
from .transfoxl import TransfoXLConfig, TransfoXLLM
from .xlnet import XLNetConfig, XLNetLM
from .gemma3n import (
    Gemma3nConfig,
    Gemma3nLM,
)
from .transformer import (
    Attention,
    MLAttention,
    Block,
    CausalLM,
    MusicgenConfig,
    MusicgenLM,
    MLP as TransformerMLP,
    MoEMLP,
    PrunedSublayer,
    TransformerConfig,
    ce_loss,
    prune_blocks,
)

__all__ = [
    "MLP",
    "make_mlp",
    "ConvNeXt",
    "convnext_small",
    "convnext_tiny",
    "convnextv2_tiny",
    "EfficientFormerV1",
    "EfficientFormerV2",
    "efficientformerv2_s0",
    "efficientformerv2_s1",
    "EfficientNet",
    "efficientnet_b0",
    "HGNetV2",
    "TextNet",
    "VAN",
    "BiT",
    "FocalNet",
    "SwiftFormer",
    "PVT",
    "PVTv2",
    "Segformer",
    "MobileViT",
    "MobileViTV2",
    "CvT",
    "Hiera",
    "LeViT",
    "ClipClassifier",
    "SiglipClassifier",
    "PerceiverImageClassifierLearned",
    "ResNet",
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "RegNet",
    "regnet_y_tiny",
    "MobileNetV1",
    "MobileNetV2",
    "mobilenet_v2_tiny",
    "PoolFormer",
    "poolformer_s12",
    "PhiCausalLM",
    "PhiConfig",
    "ViT",
    "SwinV2",
    "swinv2_cr_small_ns",
    "swinv2_cr_tiny_ns",
    "swinv2_small",
    "swinv2_tiny",
    "vit_base",
    "vit_small",
    "vit_tiny",
    "deit_small",
    "dinov2_small",
    "Mamba1Mixer",
    "Mamba2Mixer",
    "MambaBlock",
    "MambaConfig",
    "MambaLM",
    "RwkvConfig",
    "RwkvLM",
    "ZambaConfig",
    "ZambaLM",
    "Gemma3nConfig",
    "Gemma3nLM",
    "CpmAntConfig",
    "CpmAntLM",
    "ProphetNetConfig",
    "ProphetNetLM",
    "XLNetConfig",
    "XLNetLM",
    "TransfoXLConfig",
    "TransfoXLLM",
    "MegaConfig",
    "MegaLM",
    "ReformerConfig",
    "ReformerLM",
    "BltConfig",
    "BltLM",
    "MusicgenConfig",
    "MusicgenLM",
    "Attention",
    "MLAttention",
    "Block",
    "CausalLM",
    "TransformerMLP",
    "MoEMLP",
    "StackedMoEMLP",
    "stack_moe_experts",
    "unstack_moe_experts",
    "TransformerConfig",
    "PrunedSublayer",
    "ce_loss",
    "prune_blocks",
]
