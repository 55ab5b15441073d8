from .gram_pallas import gram_xla, should_use_syrk, syrk_gram
from .lowrank_pallas import lowrank_matmul, lowrank_xla

__all__ = ["gram_xla", "should_use_syrk", "syrk_gram", "lowrank_matmul", "lowrank_xla"]
