"""Block-pruned custom builder (native analogue of the reference's
examples_builder/bp_indices_builder.py, which depends on an external
llm_pipelines package): builds a CausalLM, removes the attention/MLP
sublayers listed in the builder config, optionally loads a state dict,
and returns the pruned model for decomposition.

Builder config keys:
  vocab_size (int, default 256)
  seed (int, default 0)
  bp_attn_indices (list[int]): blocks whose attention sublayer is pruned
  bp_mlp_indices (list[int]):  blocks whose MLP sublayer is pruned
  bp_state_dict (str | None):  torch-format .pt/.safetensors to load into
      the PRUNED model (keys of removed sublayers must be absent)
"""

import jax

from apps.trainer_llm.builder import ByteTokenizer
from ptdeco_tpu import models, utils


def make_model_and_tokenizer(config: dict):
    vocab = int(config.get("vocab_size", 256))
    cfg = models.TransformerConfig.tiny(vocab_size=vocab)
    model = models.CausalLM.create(
        jax.random.PRNGKey(int(config.get("seed", 0))), cfg
    )
    model = models.prune_blocks(
        model,
        attn_indices=list(config.get("bp_attn_indices", [])),
        mlp_indices=list(config.get("bp_mlp_indices", [])),
    )
    sd_path = config.get("bp_state_dict")
    if sd_path:
        if str(sd_path).endswith(".safetensors"):
            sd = utils.load_state_dict_safetensors(sd_path)
        else:
            sd = utils.load_state_dict_pt(sd_path)
        model = utils.load_state_dict(model, sd)
    return model, ByteTokenizer(vocab)
