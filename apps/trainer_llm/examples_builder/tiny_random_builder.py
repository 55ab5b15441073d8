"""Sample custom builder (reference examples_builder/*, loaded via
``decomposed_model_custom_builder_path``): builds a tiny random CausalLM
with the offline byte tokenizer.  The builder contract is a module-level
``make_model_and_tokenizer(config: dict) -> (model, tokenizer)``."""

import jax

from apps.trainer_llm.builder import ByteTokenizer
from ptdeco_tpu import models


def make_model_and_tokenizer(config: dict):
    vocab = int(config.get("vocab_size", 256))
    cfg = models.TransformerConfig.tiny(vocab_size=vocab)
    if config.get("remat"):
        cfg = models.TransformerConfig(**{**cfg.__dict__, "remat": True})
    model = models.CausalLM.create(
        jax.random.PRNGKey(int(config.get("seed", 0))), cfg
    )
    return model, ByteTokenizer(vocab)
