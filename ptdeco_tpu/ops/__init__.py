from .gram_pallas import gram_xla, syrk_gram

__all__ = ["gram_xla", "syrk_gram"]
