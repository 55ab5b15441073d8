"""LLM trainer components: data loaders (v1 sample-concat, v2 greedy pack),
byte tokenizer fallback, finetune (full + LoRA) smoke, metrics."""

import numpy as np

from apps.trainer_llm.builder import ByteTokenizer
from apps.trainer_llm import datasets_hf


TEXTS = [
    "the quick brown fox jumps over the lazy dog " * 4,
    "low rank matrices compress neural networks " * 5,
    "tokens flow through the decoder stack " * 6,
] * 10


def test_v2_loader_packs_fixed_length():
    tok = ByteTokenizer(256)
    loader = datasets_hf.prepare_dataloader_v2(
        dataset=TEXTS, tokenizer=tok, max_seqlen=64, batch_size=2, separator=" "
    )
    batch = next(iter(loader))
    assert batch["input_ids"].shape == (2, 64)
    assert batch["attention_mask"].all()
    assert (batch["labels"] == batch["input_ids"]).all()
    assert len(loader) >= 1


def test_v2_native_matches_python():
    """The C++ packer and the pure-python fallback must agree."""
    tok = ByteTokenizer(256)
    sep = tok(" ", add_special_tokens=False)["input_ids"]
    token_lists = [tok(t)["input_ids"] for t in TEXTS]

    from ptdeco_tpu.data import native_packer

    rows_native = native_packer.pack_greedy(token_lists, sep, 64)

    rows_py = []
    buffer = []
    idx = 0
    while idx < len(TEXTS) - 1:
        while len(buffer) <= 64 and idx < len(TEXTS) - 1:
            buffer += token_lists[idx] + list(sep)
            idx += 1
        if len(buffer) >= 64:
            rows_py.append(buffer[:64])
        buffer = []
    np.testing.assert_array_equal(rows_native, np.asarray(rows_py, np.int32))


def test_v1_loader_sample_concat():
    tok = ByteTokenizer(256)
    loader = datasets_hf.prepare_dataloader_v1(
        dataset=TEXTS,
        tokenizer=tok,
        separator=" ",
        max_seqlen=48,
        batch_size=2,
        nsamples=6,
    )
    assert len(loader) == 3
    epoch = list(loader.one_epoch())
    assert len(epoch) == 3
    for b in epoch:
        assert b["input_ids"].shape == (2, 48)


def test_finetune_full_and_lora_smoke():
    import jax
    import jax.numpy as jnp

    from ptdeco_tpu import dwain, finetune, models, nn

    cfg = models.TransformerConfig.tiny(vocab_size=64)
    model = models.CausalLM.create(jax.random.PRNGKey(0), cfg)

    def batches():
        key = jax.random.PRNGKey(5)
        while True:
            key, sub = jax.random.split(key)
            ids = jax.random.randint(sub, (2, 16), 0, 64)
            yield {
                "input_ids": ids,
                "attention_mask": jnp.ones((2, 16), jnp.int32),
            }

    it = batches()
    names = ["model.layers.0.mlp.up_proj", "model.layers.0.mlp.gate_proj"]
    # decompose the two sites crudely so factor pairs exist
    from ptdeco_tpu import engine

    for name in names:
        site = engine.get_site(model, name)
        k = engine.get_site_kernel2d(model, site)
        g, _ = engine.compute_output_grams(model, [name], it, 2)
        u = engine.eigenvectors_from_gram(g[name])
        k1, k2 = engine.build_factors(k, u, 48)
        model = nn.replace_submodule(
            model, name, engine.build_decomposed_module(model, site, k1, k2)
        )

    m1 = finetune.finetune_full(
        model=model,
        ft_iterator=it,
        decomposed_modules=names,
        loss_fn=models.ce_loss,
        num_steps=3,
        lr=1e-4,
    )
    assert isinstance(nn.get_submodule(m1, names[0]), nn.Sequential)

    m2 = finetune.finetune_lora(
        model=model,
        ft_iterator=it,
        decomposed_modules=names,
        loss_fn=models.ce_loss,
        num_steps=3,
        lr=1e-3,
        min_rank_to_finetune=8,
    )
    # adapters merged away
    from ptdeco_tpu.finetune import LoRALinear

    assert not any(
        isinstance(m, LoRALinear) for _, m in nn.named_modules(m2)
    )
    # training moved the factor weights
    k_before = nn.get_submodule(model, f"{names[0]}.0").kernel
    k_after = nn.get_submodule(m2, f"{names[0]}.0").kernel
    assert float(jnp.max(jnp.abs(k_before - k_after))) > 0
