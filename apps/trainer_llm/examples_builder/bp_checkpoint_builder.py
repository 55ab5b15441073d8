"""Block-pruned CHECKPOINT custom builder — native analogue of the
reference's examples_builder/bp_checkpoint_builder.py (which delegates to
the external, non-vendored ``llm_pipelines.block_pruning.loaders``): build
the original model, then recreate a previously PRUNED model from a pruned
checkpoint directory and (optionally) load its weights.

Pruned-checkpoint directory layout (produced by any block-pruning run
using ``models.prune_blocks``):

  bp_config.json             {"attn_indices": [...], "mlp_indices": [...]}
  state_dict.safetensors     torch-format weights of the PRUNED model
                             (or state_dict.pt)

Builder config keys (decomposed_model_custom_builder_config):
  bp_model_path (str):        the pruned checkpoint directory
  bp_load_state_dict (bool):  load the weights (default True); False keeps
                              the freshly initialized pruned architecture
                              (the reference's flag of the same name)
  hf_checkpoint_path (str | None): HF snapshot dir for the ORIGINAL model
                              (llama-family config.json); None = tiny
                              random model (offline testing)
  vocab_size, seed:           tiny-model knobs when hf_checkpoint_path is None
"""

import json
import pathlib

import jax
import jax.numpy as jnp

from apps.trainer_llm.builder import ByteTokenizer, make_tokenizer
from ptdeco_tpu import models, utils


def make_model_and_tokenizer(config: dict):
    bp_dir = pathlib.Path(config["bp_model_path"])
    with open(bp_dir / "bp_config.json") as f:
        bp_cfg = json.load(f)

    hf_path = config.get("hf_checkpoint_path")
    if hf_path:
        from ptdeco_tpu.models import hf_loader

        tcfg = models.TransformerConfig.from_hf_config(
            hf_loader.read_hf_config(hf_path), dtype=jnp.bfloat16
        )
        model = models.CausalLM.create(
            jax.random.PRNGKey(int(config.get("seed", 0))), tcfg
        )
        # the ORIGINAL model carries the pretrained snapshot weights (the
        # reference builds it with from_pretrained) — load them before
        # pruning so bp_load_state_dict=False keeps pretrained, not random,
        # parameters
        model = hf_loader.load_into_causal_lm(model, str(hf_path))
        tokenizer = make_tokenizer(
            str(hf_path), tcfg.vocab_size, checkpoint_path=str(hf_path)
        )
    else:
        vocab = int(config.get("vocab_size", 256))
        tcfg = models.TransformerConfig.tiny(vocab_size=vocab)
        model = models.CausalLM.create(
            jax.random.PRNGKey(int(config.get("seed", 0))), tcfg
        )
        tokenizer = ByteTokenizer(vocab)

    model = models.prune_blocks(
        model,
        attn_indices=list(bp_cfg.get("attn_indices", [])),
        mlp_indices=list(bp_cfg.get("mlp_indices", [])),
    )

    if config.get("bp_load_state_dict", True):
        sf = bp_dir / "state_dict.safetensors"
        pt = bp_dir / "state_dict.pt"
        if sf.exists():
            sd = utils.load_state_dict_safetensors(str(sf))
        elif pt.exists():
            sd = utils.load_state_dict_pt(str(pt))
        else:
            raise FileNotFoundError(
                f"No state_dict.safetensors / state_dict.pt in {bp_dir}"
            )
        model = utils.load_state_dict(model, sd)
    return model, tokenizer
