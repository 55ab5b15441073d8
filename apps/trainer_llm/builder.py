"""Model/tokenizer builder for the LLM trainer.

The reference builds HF torch models (AutoModelForCausalLM,
/root/reference/examples/trainer_llm/builder.py:97-107) and supports a
user-supplied "custom builder" python file (:66-91).  Here models are native
ptdeco_tpu CausalLMs; known HF checkpoints are imported by name via
ptdeco_tpu.models.hf_loader, and the custom-builder hook is preserved.
"""

from __future__ import annotations

import importlib.util
import json
import logging
import pathlib
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ptdeco_tpu import models, nn, utils

logger = logging.getLogger(__name__)

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}

_KNOWN_CONFIGS = {
    "tiny": models.TransformerConfig.tiny,
    "tinyllama-1.1b": models.TransformerConfig.tinyllama_1_1b,
    "TinyLlama/TinyLlama-1.1B-Chat-v1.0": models.TransformerConfig.tinyllama_1_1b,
    "qwen2-1.5b": models.TransformerConfig.qwen2_1_5b,
    "Qwen/Qwen2-1.5B": models.TransformerConfig.qwen2_1_5b,
    "llama3-8b": models.TransformerConfig.llama3_8b,
    "meta-llama/Meta-Llama-3-8B": models.TransformerConfig.llama3_8b,
}

_PHI_CONFIGS = {
    "phi-2": models.PhiConfig.phi2,
    "microsoft/phi-2": models.PhiConfig.phi2,
    "phi-tiny": models.PhiConfig.tiny,
}

# alias -> canonical HF repo id, for tokenizer resolution (passing the bare
# alias to AutoTokenizer.from_pretrained would raise and silently fall back
# to the byte tokenizer)
_HF_IDS = {
    "tinyllama-1.1b": "TinyLlama/TinyLlama-1.1B-Chat-v1.0",
    "qwen2-1.5b": "Qwen/Qwen2-1.5B",
    "llama3-8b": "meta-llama/Meta-Llama-3-8B",
    "phi-2": "microsoft/phi-2",
}


def str_to_dtype(s: str) -> Any:
    return _DTYPES[s]


def log_linear_submodules(m: nn.Module) -> None:
    """Inventory of decomposeable sites (reference builder.py:14-24)."""
    res = ["All Linear modules of the model:"]
    i = 1
    for name, mod in nn.named_modules(m):
        if isinstance(mod, nn.Linear):
            res.append(f"  - {name}  # ({i}) {mod.in_features}->{mod.out_features}")
            i += 1
    logger.info("\n".join(res))


def _load_custom_builder(
    path: str, config: Optional[dict[str, Any]]
) -> tuple[nn.Module, Any]:
    spec = importlib.util.spec_from_file_location("custom_builder", path)
    assert spec is not None and spec.loader is not None
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.make_model_and_tokenizer(config or {})


def make_model_and_tokenizer(
    *,
    model_name: str,
    model_revision: str = "main",
    dtype: str = "float32",
    custom_builder_path: Optional[str] = None,
    custom_builder_config: Optional[dict[str, Any]] = None,
    checkpoint_path: Optional[str] = None,
    enable_gradient_checkpointing: bool = False,
    seed: int = 0,
) -> tuple[nn.Module, Any]:
    """Build (model, tokenizer).

    * custom builder file wins if given (reference :66-91);
    * a known name builds the native architecture; if ``checkpoint_path`` or
      a local HF snapshot is available, weights are imported, else random
      init (zero-egress environments);
    * tokenizer loads via transformers if available, else a byte-level
      fallback for offline testing.
    """
    if custom_builder_path is not None:
        logger.info(f"Using custom builder {custom_builder_path}")
        return _load_custom_builder(custom_builder_path, custom_builder_config)

    jdtype = str_to_dtype(dtype)
    if model_name in _PHI_CONFIGS:
        cfg = _PHI_CONFIGS[model_name](dtype=jdtype)
        model: nn.Module = models.PhiCausalLM.create(jax.random.PRNGKey(seed), cfg)
        if enable_gradient_checkpointing:
            model = model.replace(model=model.model.replace(remat=True))
            logger.info("Per-block gradient checkpointing (remat) enabled")
    elif model_name in _KNOWN_CONFIGS:
        cfg = _KNOWN_CONFIGS[model_name](dtype=jdtype)
        model = models.CausalLM.create(jax.random.PRNGKey(seed), cfg)
        if enable_gradient_checkpointing:
            model = model.replace(model=model.model.replace(remat=True))
            logger.info("Per-block gradient checkpointing (remat) enabled")
    elif checkpoint_path is not None and (
        pathlib.Path(checkpoint_path) / "config.json"
    ).exists():
        # generic path: ANY llama-config-family snapshot (llama/mistral/
        # qwen2/gemma) builds straight from its config.json — the
        # AutoModelForCausalLM analogue for the family (reference
        # trainer_llm/builder.py:97-107)
        from ptdeco_tpu.models import hf_loader

        hf_cfg = hf_loader.read_hf_config(checkpoint_path)
        logger.info(
            f"Building {model_name!r} generically from config.json "
            f"(model_type={hf_cfg.get('model_type')!r})"
        )
        if hf_cfg.get("model_type") == "phi":
            pcfg = models.PhiConfig.from_hf_config(hf_cfg, dtype=jdtype)
            cfg = pcfg
            model = models.PhiCausalLM.create(jax.random.PRNGKey(seed), pcfg)
            if enable_gradient_checkpointing:
                model = model.replace(model=model.model.replace(remat=True))
        elif hf_cfg.get("model_type") in ("mamba", "falcon_mamba", "mamba2"):
            cfg = models.MambaConfig.from_hf_config(
                hf_cfg, dtype=jdtype, remat=enable_gradient_checkpointing
            )
            model = models.MambaLM.create(jax.random.PRNGKey(seed), cfg)
        elif hf_cfg.get("model_type") == "rwkv":
            cfg = models.RwkvConfig.from_hf_config(
                hf_cfg, dtype=jdtype, remat=enable_gradient_checkpointing
            )
            model = models.RwkvLM.create(jax.random.PRNGKey(seed), cfg)
        elif hf_cfg.get("model_type") in ("gemma3n", "gemma3n_text"):
            cfg = models.Gemma3nConfig.from_hf_config(
                hf_cfg, dtype=jdtype, remat=enable_gradient_checkpointing
            )
            model = models.Gemma3nLM.create(jax.random.PRNGKey(seed), cfg)
        elif hf_cfg.get("model_type") in ("zamba", "zamba2"):
            cfg = models.ZambaConfig.from_hf_config(
                hf_cfg, dtype=jdtype, remat=enable_gradient_checkpointing
            )
            model = models.ZambaLM.create(jax.random.PRNGKey(seed), cfg)
        elif hf_cfg.get("model_type") == "cpmant":
            cfg = models.CpmAntConfig.from_hf_config(hf_cfg, dtype=jdtype)
            model = models.CpmAntLM.create(jax.random.PRNGKey(seed), cfg)
        elif hf_cfg.get("model_type") == "xlnet":
            cfg = models.XLNetConfig.from_hf_config(hf_cfg, dtype=jdtype)
            model = models.XLNetLM.create(jax.random.PRNGKey(seed), cfg)
        elif hf_cfg.get("model_type") == "blt":
            cfg = models.BltConfig.from_hf_config(hf_cfg, dtype=jdtype)
            model = models.BltLM.create(jax.random.PRNGKey(seed), cfg)
        elif hf_cfg.get("model_type") == "reformer":
            cfg = models.ReformerConfig.from_hf_config(hf_cfg, dtype=jdtype)
            model = models.ReformerLM.create(jax.random.PRNGKey(seed), cfg)
        elif hf_cfg.get("model_type") == "mega":
            cfg = models.MegaConfig.from_hf_config(hf_cfg, dtype=jdtype)
            model = models.MegaLM.create(jax.random.PRNGKey(seed), cfg)
        elif hf_cfg.get("model_type") == "transfo-xl":
            cfg = models.TransfoXLConfig.from_hf_config(hf_cfg, dtype=jdtype)
            model = models.TransfoXLLM.create(jax.random.PRNGKey(seed), cfg)
        elif hf_cfg.get("model_type") in ("prophetnet", "xlm-prophetnet"):
            cfg = models.ProphetNetConfig.from_hf_config(
                hf_cfg, dtype=jdtype
            )
            model = models.ProphetNetLM.create(jax.random.PRNGKey(seed), cfg)
        elif hf_cfg.get("model_type") in (
            "musicgen", "musicgen_melody",
            "musicgen_decoder", "musicgen_melody_decoder",
        ):
            cfg = models.MusicgenConfig.from_hf_config(
                hf_cfg, dtype=jdtype, remat=enable_gradient_checkpointing
            )
            model = models.MusicgenLM.create(jax.random.PRNGKey(seed), cfg)
        else:
            cfg = models.TransformerConfig.from_hf_config(
                hf_cfg, dtype=jdtype, remat=enable_gradient_checkpointing
            )
            model = models.CausalLM.create(jax.random.PRNGKey(seed), cfg)
    else:
        raise ValueError(
            f"Unknown model {model_name!r}; known: "
            f"{sorted(_KNOWN_CONFIGS) + sorted(_PHI_CONFIGS)} "
            "(or pass a checkpoint dir with a llama-family config.json, "
            "or decomposed_model_custom_builder_path)"
        )

    if checkpoint_path is not None:
        from ptdeco_tpu.models import hf_loader

        translator = None
        if (pathlib.Path(checkpoint_path) / "config.json").exists():
            hf_cfg2 = hf_loader.read_hf_config(checkpoint_path)
            if hf_cfg2.get("model_type") == "phi3":
                n_heads = int(hf_cfg2["num_attention_heads"])
                n_kv = int(hf_cfg2.get("num_key_value_heads", n_heads))
                hd = int(hf_cfg2["hidden_size"]) // n_heads

                def translator(sd):  # noqa: F811 - deliberate rebind
                    return hf_loader.split_phi3_fused_projections(
                        sd, n_heads, n_kv, hd
                    )
            else:
                # central model_type -> layout-translator registry
                # (mixtral/glm4/deepseek/gpt_oss/gpt2/gpt_neox/falcon/
                # starcoder2; None when names already match)
                translator = hf_loader.translator_for(hf_cfg2)

        model = hf_loader.load_into_causal_lm(
            model, checkpoint_path, key_translator=translator
        )
        logger.info(f"Loaded weights from {checkpoint_path}")
    else:
        logger.info("No checkpoint available - randomly initialized weights")

    tokenizer = make_tokenizer(
        model_name, cfg.vocab_size, checkpoint_path=checkpoint_path
    )
    log_linear_submodules(model)
    return model, tokenizer


class ByteTokenizer:
    """Offline fallback tokenizer (byte-level, vocab<=256+specials)."""

    def __init__(self, vocab_size: int) -> None:
        self.vocab_size = vocab_size
        self.eos_token = "\x00"
        self.eos_token_id = 0
        self.pad_token = "\x00"
        self.pad_token_id = 0

    def __call__(self, text: str, add_special_tokens: bool = False, **kw: Any):
        ids = [1 + (b % (self.vocab_size - 1)) for b in text.encode("utf-8")]
        return {"input_ids": ids}

    def decode(self, ids: list[int]) -> str:
        return bytes((i - 1) % 256 for i in ids if i > 0).decode(
            "utf-8", errors="replace"
        )


def make_tokenizer(
    model_name: str, vocab_size: int, checkpoint_path: Optional[str] = None
) -> Any:
    """Resolve the tokenizer: a local HF snapshot (checkpoint_path) first —
    it ships tokenizer files and works offline — then the canonical HF id
    for known aliases, then the name as given; byte-level fallback last."""
    candidates = []
    if checkpoint_path is not None:
        candidates.append(checkpoint_path)
    candidates.append(_HF_IDS.get(model_name, model_name))
    try:
        import transformers
    except ImportError as e:
        logger.warning(f"Falling back to ByteTokenizer ({e})")
        return ByteTokenizer(vocab_size)
    last_err: Any = None
    for cand in candidates:
        try:
            tok = transformers.AutoTokenizer.from_pretrained(cand)
            if tok.pad_token is None:
                tok.pad_token = tok.eos_token
            return tok
        except Exception as e:  # offline / unknown name
            last_err = e
    logger.warning(f"Falling back to ByteTokenizer ({last_err})")
    return ByteTokenizer(vocab_size)


def apply_decompose_config_and_state_dict(
    model: nn.Module,
    decompose_config_path: str,
    decompose_state_dict_path: str,
) -> nn.Module:
    """Rebuild a decomposed checkpoint (reference builder.py:119-145)."""
    with open(decompose_config_path) as f:
        decompose_config = json.load(f)
    model = utils.apply_decompose_config(model, decompose_config)
    sd_path = pathlib.Path(decompose_state_dict_path)
    if sd_path.suffix == ".safetensors":
        sd = utils.load_state_dict_safetensors(str(sd_path))
    else:
        sd = utils.load_state_dict_pt(str(sd_path))
    model = utils.load_state_dict(model, sd, strict=False)
    # audit (reference loads strict): a mismatched config/state-dict pair
    # must not silently leave zero-filled factor pairs
    own = utils.statedict.state_dict_keys(model)
    missing = own - set(sd.keys())
    unexpected = set(sd.keys()) - own
    if missing:
        raise KeyError(
            f"decompose_state_dict is missing {len(missing)} keys the "
            f"decomposed model needs (first: {sorted(missing)[:5]}) — "
            "config/state-dict mismatch?"
        )
    if unexpected:
        logger.warning(
            f"decompose_state_dict has {len(unexpected)} unused keys "
            f"(first: {sorted(unexpected)[:5]})"
        )
    return model


def validate_module_names(model: nn.Module, names: Optional[list[str]]) -> None:
    """Fail fast on typo'd blacklist entries (reference builder.py:148-158)."""
    if names is None:
        return
    known = {name for name, _ in nn.named_modules(model)}
    unknown = [n for n in names if n not in known]
    if unknown:
        raise ValueError(f"Unknown module names: {unknown}")
