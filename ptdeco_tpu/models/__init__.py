from .mlp import MLP, make_mlp
from .transformer import (
    Attention,
    Block,
    CausalLM,
    MLP as TransformerMLP,
    TransformerConfig,
    ce_loss,
)

__all__ = [
    "MLP",
    "make_mlp",
    "Attention",
    "Block",
    "CausalLM",
    "TransformerMLP",
    "TransformerConfig",
    "ce_loss",
]
