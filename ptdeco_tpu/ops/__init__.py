from .flash_attention import flash_attention
from .gram_pallas import (
    gram_xla,
    should_use_syrk,
    syrk_gram,
    syrk_gram_partitioned,
    syrk_gram_sharded,
)
from .lowrank_pallas import lowrank_matmul, lowrank_xla

__all__ = [
    "flash_attention",
    "gram_xla",
    "should_use_syrk",
    "syrk_gram",
    "syrk_gram_partitioned",
    "syrk_gram_sharded",
    "lowrank_matmul",
    "lowrank_xla",
]
