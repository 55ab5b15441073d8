"""KV-cache serving path: cached forwards must reproduce the uncached
model exactly (same einsum semantics, masked cache slots contribute zero
probability), generate must match a naive re-forward loop, and the path
must work unchanged on decomposed models.

The reference has no generation path at all (its deployment story ends at
loglikelihood scoring, /root/reference/examples/trainer_llm/metrics.py:81-107);
these tests pin the capability added on top."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptdeco_tpu import dwain, engine, models, serving


def make_lm(key=0, **overrides):
    base = dict(
        vocab_size=64,
        dim=32,
        n_layers=2,
        n_heads=4,
        n_kv_heads=2,
        hidden_dim=48,
        dtype=jnp.float32,
    )
    base.update(overrides)
    cfg = models.TransformerConfig(**base)
    return models.CausalLM.create(jax.random.PRNGKey(key), cfg), cfg


def naive_greedy(lm, prompt_ids, n_new):
    """Reference decode loop: full uncached re-forward per token."""
    ids = jnp.asarray(prompt_ids, jnp.int32)
    out = []
    for _ in range(n_new):
        logits = lm({"input_ids": ids})
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        out.append(nxt)
        ids = jnp.concatenate([ids, nxt[:, None]], axis=1)
    return jnp.stack(out, axis=1)


VARIANTS = {
    "gqa_rope": {},
    "mha": dict(n_kv_heads=4),
    "gemma2ish": dict(
        sandwich_norms=True,
        attn_logit_softcap=30.0,
        final_logit_softcap=10.0,
        query_scale_override=13.0,
        scale_embeddings=True,
        tie_embeddings=True,
    ),
    "gptossish": dict(
        attn_sinks=True,
        sliding_window=4,
        layer_types=("sliding_attention", "full_attention"),
        qkv_bias=True,
        o_proj_bias=True,
    ),
    "bloomish": dict(
        use_alibi=True,
        use_rope=False,
        embed_norm=True,
        norm_type="layernorm",
        mlp_gated=False,
        n_kv_heads=4,
    ),
    "gpt2ish": dict(
        learned_pos=64,
        use_rope=False,
        norm_type="layernorm",
        mlp_gated=False,
        n_kv_heads=4,
    ),
    "llama4ish": dict(
        qk_l2norm=True,
        attention_chunk_size=4,
        layer_types=("chunked_attention", "full_attention"),
    ),
    "qwen3ish": dict(qk_norm=True),
}


@pytest.mark.parametrize("variant", sorted(VARIANTS))
def test_prefill_logits_match_full_forward(variant):
    lm, _ = make_lm(key=1, **VARIANTS[variant])
    ids = jax.random.randint(jax.random.PRNGKey(2), (2, 7), 0, 64)
    ref = lm({"input_ids": ids})
    caches = serving.init_cache(lm, 2, 12)
    got, caches = serving.forward_with_cache(lm, ids, caches, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    # decode continuation: logits for position s must equal a full forward
    # over the extended sequence
    nxt = jnp.argmax(got[:, -1:, :], axis=-1).astype(jnp.int32)
    ext = jnp.concatenate([ids, nxt], axis=1)
    ref2 = lm({"input_ids": ext})[:, -1, :]
    got2, _ = serving.forward_with_cache(lm, nxt, caches, 7)
    np.testing.assert_allclose(
        np.asarray(got2[:, 0, :]), np.asarray(ref2), atol=1e-5
    )


@pytest.mark.parametrize("variant", ["gqa_rope", "gemma2ish", "gptossish"])
def test_greedy_generate_matches_uncached_loop(variant):
    lm, _ = make_lm(key=3, **VARIANTS[variant])
    prompt = jax.random.randint(jax.random.PRNGKey(4), (2, 5), 0, 64)
    want = naive_greedy(lm, prompt, 6)
    got = serving.generate(lm, prompt, 6)
    assert got.shape == (2, 6)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_generate_single_token():
    lm, _ = make_lm(key=5)
    prompt = jax.random.randint(jax.random.PRNGKey(6), (1, 4), 0, 64)
    got = serving.generate(lm, prompt, 1)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(naive_greedy(lm, prompt, 1))
    )


def test_eos_early_stop_fills_with_eos():
    lm, _ = make_lm(key=7)
    prompt = jax.random.randint(jax.random.PRNGKey(8), (2, 4), 0, 64)
    free = serving.generate(lm, prompt, 5)
    eos = int(np.asarray(free)[0, 1])  # force a stop after 2 new tokens
    got = np.asarray(serving.generate(lm, prompt, 5, eos_id=eos))
    row = got[0]
    hit = int(np.argmax(row == eos))
    assert row[hit] == eos
    assert (row[hit:] == eos).all()


def test_top_p_tiny_mass_equals_greedy():
    """A vanishing nucleus keeps only the argmax token — sampling with
    top_p ~ 0 must reproduce the greedy continuation."""
    lm, _ = make_lm(key=90)
    prompt = jax.random.randint(jax.random.PRNGKey(91), (2, 4), 0, 64)
    want = serving.generate(lm, prompt, 5)
    got = serving.generate(
        lm, prompt, 5, temperature=0.7, top_p=1e-9,
        key=jax.random.PRNGKey(92),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_top_p_full_mass_equals_plain_sampling():
    """top_p = 1 keeps every token (the prefix-mass test is strict), so
    the filtered logits equal the raw ones and the sample must match the
    unfiltered categorical draw key-for-key."""
    lm, _ = make_lm(key=93)
    prompt = jax.random.randint(jax.random.PRNGKey(94), (2, 4), 0, 64)
    key = jax.random.PRNGKey(95)
    plain = serving.generate(lm, prompt, 4, temperature=0.9, key=key)
    nucleus = serving.generate(
        lm, prompt, 4, temperature=0.9, top_p=1.0, key=key
    )
    np.testing.assert_array_equal(np.asarray(nucleus), np.asarray(plain))


def test_top_k_one_equals_greedy():
    """top_k = 1 leaves only the argmax token, whatever the key."""
    lm, _ = make_lm(key=96)
    prompt = jax.random.randint(jax.random.PRNGKey(97), (2, 4), 0, 64)
    want = serving.generate(lm, prompt, 5)
    got = serving.generate(
        lm, prompt, 5, temperature=0.9, top_k=1,
        key=jax.random.PRNGKey(98),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_top_k_full_vocab_equals_plain_sampling():
    """top_k = vocab keeps everything; the draw must match key-for-key."""
    lm, _ = make_lm(key=99)
    prompt = jax.random.randint(jax.random.PRNGKey(100), (2, 4), 0, 64)
    key = jax.random.PRNGKey(101)
    plain = serving.generate(lm, prompt, 4, temperature=0.9, key=key)
    got = serving.generate(
        lm, prompt, 4, temperature=0.9, top_k=64, key=key
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(plain))


def test_top_k_restricts_support():
    """Every token sampled with top_k = 3 must be one of the 3 largest
    logits of its own step's distribution (checked against a step-by-step
    uncached re-forward of the emitted prefix)."""
    lm, _ = make_lm(key=102)
    prompt = jax.random.randint(jax.random.PRNGKey(103), (2, 4), 0, 64)
    out = serving.generate(
        lm, prompt, 5, temperature=2.0, top_k=3,
        key=jax.random.PRNGKey(104),
    )
    ids = jnp.asarray(prompt, jnp.int32)
    for t in range(5):
        logits = lm({"input_ids": ids})[:, -1, :]
        top3 = np.asarray(jax.lax.top_k(logits, 3)[1])
        for b in range(2):
            assert int(out[b, t]) in top3[b].tolist()
        ids = jnp.concatenate([ids, out[:, t : t + 1]], axis=1)


def test_min_p_one_equals_greedy():
    """min_p = 1 keeps only tokens at the max probability — the draw must
    reproduce the greedy continuation, whatever the key."""
    lm, _ = make_lm(key=105)
    prompt = jax.random.randint(jax.random.PRNGKey(106), (2, 4), 0, 64)
    want = serving.generate(lm, prompt, 5)
    got = serving.generate(
        lm, prompt, 5, temperature=0.9, min_p=1.0,
        key=jax.random.PRNGKey(107),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_min_p_zero_equals_plain_sampling():
    lm, _ = make_lm(key=108)
    prompt = jax.random.randint(jax.random.PRNGKey(109), (2, 4), 0, 64)
    key = jax.random.PRNGKey(110)
    plain = serving.generate(lm, prompt, 4, temperature=0.9, key=key)
    got = serving.generate(
        lm, prompt, 4, temperature=0.9, min_p=0.0, key=key
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(plain))


def test_forward_with_cache_last_pos():
    """last_pos computes norm+head on one row per batch element; its
    logits must equal the matching rows of the full-head forward, and the
    returned caches must be identical."""
    lm, _ = make_lm(key=130)
    ids = jax.random.randint(jax.random.PRNGKey(131), (2, 6), 0, 64)
    full, c_full = serving.forward_with_cache(
        lm, ids, serving.init_cache(lm, 2, 8), 0
    )
    lp = jnp.asarray([5, 3], jnp.int32)
    one, c_one = serving.forward_with_cache(
        lm, ids, serving.init_cache(lm, 2, 8), 0, last_pos=lp
    )
    assert one.shape == (2, 1, 64)
    want = np.take_along_axis(
        np.asarray(full), np.asarray(lp)[:, None, None], axis=1
    )[:, 0, :]
    np.testing.assert_allclose(
        np.asarray(one[:, 0, :]), want, atol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(c_full), jax.tree_util.tree_leaves(c_one)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def naive_rep_greedy(lm, rows, p, n_new):
    """Oracle: full re-forward greedy with HF RepetitionPenalty semantics
    (prompt + generated tokens penalized; per-row unpadded prompts)."""
    outs = []
    for r in rows:
        ids = [int(t) for t in np.asarray(r)]
        seen = set(ids)
        new = []
        for _ in range(n_new):
            lg = np.array(
                lm({"input_ids": jnp.asarray([ids], jnp.int32)})[0, -1],
                np.float32,
            )
            for t in seen:
                lg[t] = lg[t] / p if lg[t] > 0 else lg[t] * p
            nxt = int(lg.argmax())
            new.append(nxt)
            seen.add(nxt)
            ids.append(nxt)
        outs.append(new)
    return np.asarray(outs, np.int32)


def test_repetition_penalty_matches_naive():
    lm, _ = make_lm(key=121)
    prompt = jax.random.randint(jax.random.PRNGKey(122), (2, 4), 0, 64)
    want = naive_rep_greedy(lm, [prompt[0], prompt[1]], 1.5, 6)
    got = serving.generate(lm, prompt, 6, repetition_penalty=1.5)
    np.testing.assert_array_equal(np.asarray(got), want)
    # penalty 1.0 is a no-op
    plain = serving.generate(lm, prompt, 6)
    same = serving.generate(lm, prompt, 6, repetition_penalty=1.0)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(plain))


def test_repetition_penalty_ragged_excludes_pad_tail():
    """Right-pad junk must NOT be marked as seen: each ragged row matches
    the oracle run on its UNPADDED prompt."""
    lm, _ = make_lm(key=123)
    r0 = jax.random.randint(jax.random.PRNGKey(124), (5,), 1, 64)
    r1 = jax.random.randint(jax.random.PRNGKey(125), (3,), 1, 64)
    padded = jnp.stack(
        [r0, jnp.concatenate([r1, jnp.zeros(2, r1.dtype)])]
    )
    want = np.stack(
        [
            naive_rep_greedy(lm, [r0], 1.5, 5)[0],
            naive_rep_greedy(lm, [r1], 1.5, 5)[0],
        ]
    )
    got = serving.generate(
        lm, padded, 5, repetition_penalty=1.5,
        prompt_lens=jnp.asarray([5, 3], jnp.int32),
    )
    np.testing.assert_array_equal(np.asarray(got), want)


def test_sampling_smoke_and_determinism():
    lm, _ = make_lm(key=9)
    prompt = jax.random.randint(jax.random.PRNGKey(10), (2, 4), 0, 64)
    key = jax.random.PRNGKey(11)
    a = serving.generate(lm, prompt, 4, temperature=0.8, key=key)
    b = serving.generate(lm, prompt, 4, temperature=0.8, key=key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert a.shape == (2, 4)
    assert ((np.asarray(a) >= 0) & (np.asarray(a) < 64)).all()


def test_kv_mask_left_padded_prompts():
    """A left-padded batch with kv_mask must match each row scored alone."""
    lm, _ = make_lm(key=12)
    short = jax.random.randint(jax.random.PRNGKey(13), (1, 3), 0, 64)
    # pad 2 junk tokens on the left; mask marks slots 2.. as valid
    padded = jnp.concatenate(
        [jnp.full((1, 2), 7, jnp.int32), short], axis=1
    )
    caches = serving.init_cache(lm, 1, 8)
    kv_mask = (jnp.arange(8) >= 2)[None, :]
    got, _ = serving.forward_with_cache(
        lm, padded, caches, 0, kv_mask=kv_mask
    )
    # positions for the real tokens differ (2,3,4 vs 0,1,2) so rope models
    # won't match exactly; use a no-rope learned-pos-free variant instead
    lm2, _ = make_lm(key=12, use_rope=False, n_kv_heads=4)
    got, _ = serving.forward_with_cache(
        lm2, padded, serving.init_cache(lm2, 1, 8), 0, kv_mask=kv_mask
    )
    ref = lm2({"input_ids": short})
    np.testing.assert_allclose(
        np.asarray(got[:, -1, :]), np.asarray(ref[:, -1, :]), atol=1e-5
    )


MLA_CFG = dict(
    kv_lora_rank=16,
    q_lora_rank=24,
    qk_rope_head_dim=4,
    qk_nope_head_dim=8,
    v_head_dim=8,
    n_kv_heads=4,
)


def test_mla_prefill_and_decode_match_full_forward():
    """Deepseek-style MLA: the absorbed-latent cache path must match the
    expanded uncached forward (scores are associativity-identical)."""
    lm, _ = make_lm(key=20, **MLA_CFG)
    ids = jax.random.randint(jax.random.PRNGKey(21), (2, 6), 0, 64)
    ref = lm({"input_ids": ids})
    caches = serving.init_cache(lm, 2, 10)
    # cache holds the latent + the single rope head, NOT per-head K/V
    assert caches[0][0].shape == (2, 10, 16)
    assert caches[0][1].shape == (2, 10, 4)
    got, caches = serving.forward_with_cache(lm, ids, caches, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    nxt = jnp.argmax(got[:, -1:, :], axis=-1).astype(jnp.int32)
    ext = jnp.concatenate([ids, nxt], axis=1)
    ref2 = lm({"input_ids": ext})[:, -1, :]
    got2, _ = serving.forward_with_cache(lm, nxt, caches, 6)
    np.testing.assert_allclose(
        np.asarray(got2[:, 0, :]), np.asarray(ref2), atol=1e-4
    )


def test_mla_v2lite_no_q_bottleneck():
    cfg = dict(MLA_CFG)
    cfg.pop("q_lora_rank")
    lm, _ = make_lm(key=22, **cfg)
    prompt = jax.random.randint(jax.random.PRNGKey(23), (2, 4), 0, 64)
    want = naive_greedy(lm, prompt, 4)
    got = serving.generate(lm, prompt, 4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mla_generate_on_decomposed_kv_b_proj():
    """Decomposing kv_b_proj yields a factor pair; the absorbed cache
    contraction materializes its product and generation still matches the
    uncached decomposed model."""
    lm, _ = make_lm(key=24, **MLA_CFG)
    names = engine.get_decomposeable_submodule_names(lm)
    keep = {
        "model.layers.0.self_attn.kv_b_proj",
        "model.layers.1.self_attn.q_b_proj",
    }
    blacklist = [n for n in names if n not in keep]

    def data_iter(key):
        while True:
            key, sub = jax.random.split(key)
            yield {"input_ids": jax.random.randint(sub, (2, 8), 0, 64)}

    deco, config = dwain.decompose(
        module=lm,
        data_iterator=data_iter(jax.random.PRNGKey(25)),
        loss_fn=models.ce_loss,
        num_data_steps=2,
        metric_iterator=data_iter(jax.random.PRNGKey(26)),
        num_metric_steps=1,
        nsr_final_threshold=1e9,
        blacklisted_module_names=blacklist,
        min_rank=2,
        trade_off_factor=1e9,
        max_accepted_ppl_diff=1e9,
    )
    assert set(config.keys()) == keep
    prompt = jax.random.randint(jax.random.PRNGKey(27), (2, 5), 0, 64)
    want = naive_greedy(deco, prompt, 4)
    got = serving.generate(deco, prompt, 4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_generate_on_decomposed_model():
    lm, _ = make_lm(key=14)
    names = engine.get_decomposeable_submodule_names(lm)
    keep = {
        "model.layers.0.self_attn.q_proj",
        "model.layers.1.mlp.down_proj",
        "model.layers.1.self_attn.o_proj",
    }
    blacklist = [n for n in names if n not in keep]

    def data_iter(key):
        while True:
            key, sub = jax.random.split(key)
            ids = jax.random.randint(sub, (2, 8), 0, 64)
            yield {"input_ids": ids}

    deco, config = dwain.decompose(
        module=lm,
        data_iterator=data_iter(jax.random.PRNGKey(15)),
        loss_fn=models.ce_loss,
        num_data_steps=2,
        metric_iterator=data_iter(jax.random.PRNGKey(16)),
        num_metric_steps=1,
        nsr_final_threshold=1e9,
        blacklisted_module_names=blacklist,
        min_rank=2,
        trade_off_factor=1e9,
        max_accepted_ppl_diff=1e9,
    )
    assert set(config.keys()) == keep
    prompt = jax.random.randint(jax.random.PRNGKey(17), (2, 5), 0, 64)
    want = naive_greedy(deco, prompt, 5)
    got = serving.generate(deco, prompt, 5)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("variant", ["gqa_rope", "bloomish", "gptossish"])
def test_ragged_batch_matches_per_row(variant):
    """Right-padded variable-length prompts with prompt_lens must produce
    exactly what each row produces generated alone (slot == position, so
    pad-tail junk is causally invisible)."""
    lm, _ = make_lm(key=30, **VARIANTS[variant])
    key = jax.random.PRNGKey(31)
    rows = [
        jax.random.randint(jax.random.fold_in(key, i), (1, n), 0, 64)
        for i, n in enumerate([3, 7, 5])
    ]
    lens = jnp.asarray([3, 7, 5], jnp.int32)
    padded = jnp.zeros((3, 7), jnp.int32)
    for i, r in enumerate(rows):
        padded = padded.at[i, : r.shape[1]].set(r[0])
    got = serving.generate(lm, padded, 5, prompt_lens=lens)
    for i, r in enumerate(rows):
        want = naive_greedy(lm, r, 5)
        np.testing.assert_array_equal(
            np.asarray(got[i]), np.asarray(want[0]), err_msg=f"row {i}"
        )


def test_ragged_mla():
    lm, _ = make_lm(key=32, **MLA_CFG)
    key = jax.random.PRNGKey(33)
    rows = [
        jax.random.randint(jax.random.fold_in(key, i), (1, n), 0, 64)
        for i, n in enumerate([2, 6])
    ]
    padded = jnp.zeros((2, 6), jnp.int32)
    for i, r in enumerate(rows):
        padded = padded.at[i, : r.shape[1]].set(r[0])
    got = serving.generate(
        lm, padded, 4, prompt_lens=jnp.asarray([2, 6], jnp.int32)
    )
    for i, r in enumerate(rows):
        want = naive_greedy(lm, r, 4)
        np.testing.assert_array_equal(
            np.asarray(got[i]), np.asarray(want[0]), err_msg=f"row {i}"
        )


def decompose_all(lm, keep, min_rank=2, seed=100):
    names = engine.get_decomposeable_submodule_names(lm)

    def data_iter(key):
        while True:
            key, sub = jax.random.split(key)
            yield {"input_ids": jax.random.randint(sub, (2, 8), 0, 64)}

    deco, config = dwain.decompose(
        module=lm,
        data_iterator=data_iter(jax.random.PRNGKey(seed)),
        loss_fn=models.ce_loss,
        num_data_steps=2,
        metric_iterator=data_iter(jax.random.PRNGKey(seed + 1)),
        num_metric_steps=1,
        nsr_final_threshold=1e9,
        blacklisted_module_names=[n for n in names if n not in keep],
        min_rank=min_rank,
        trade_off_factor=1e9,
        max_accepted_ppl_diff=1e9,
    )
    assert set(config.keys()) == set(keep)
    return deco


def test_speculative_exact_vs_target_greedy():
    """Speculative output must equal the target-only greedy continuation
    EXACTLY — the draft (a dwain-decomposed copy of the target) only
    accelerates, never changes, the result."""
    lm, _ = make_lm(key=40)
    draft = decompose_all(
        lm,
        keep=[
            "model.layers.0.mlp.up_proj",
            "model.layers.1.mlp.down_proj",
            "model.layers.0.self_attn.q_proj",
        ],
        min_rank=8,
    )
    prompt = jax.random.randint(jax.random.PRNGKey(41), (2, 6), 0, 64)
    want = serving.generate(lm, prompt, 9)
    got, stats = serving.generate_speculative(
        lm, draft, prompt, 9, k=3, return_stats=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert stats["rounds"] >= 1
    assert 0 <= stats["accepted"] <= stats["drafted"]


def test_speculative_exact_with_unrelated_draft():
    """Even a draft that never matches (different random weights, fewer
    layers) must leave the output exact — acceptance just goes to ~0."""
    lm, _ = make_lm(key=42)
    draft, _ = make_lm(key=43, n_layers=1)
    prompt = jax.random.randint(jax.random.PRNGKey(44), (2, 5), 0, 64)
    want = serving.generate(lm, prompt, 7)
    got = serving.generate_speculative(lm, draft, prompt, 7, k=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_speculative_k1_and_eos():
    lm, _ = make_lm(key=45)
    draft = lm  # perfect draft: acceptance must be 100%
    prompt = jax.random.randint(jax.random.PRNGKey(46), (2, 4), 0, 64)
    want = serving.generate(lm, prompt, 6)
    got, stats = serving.generate_speculative(
        lm, draft, prompt, 6, k=1, return_stats=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert stats["accepted"] == stats["drafted"]  # identical models

    # eos parity: pick a token the free run emits, require the eos-stopped
    # outputs to match generate()'s convention (eos-filled after stop)
    eos = int(np.asarray(want)[0, 2])
    want_eos = serving.generate(lm, prompt, 6, eos_id=eos)
    got_eos = serving.generate_speculative(lm, draft, prompt, 6, k=3, eos_id=eos)
    np.testing.assert_array_equal(np.asarray(got_eos), np.asarray(want_eos))


def test_speculative_ragged():
    lm, _ = make_lm(key=47)
    draft = decompose_all(lm, keep=["model.layers.1.mlp.up_proj"], seed=120)
    key = jax.random.PRNGKey(48)
    rows = [
        jax.random.randint(jax.random.fold_in(key, i), (1, n), 0, 64)
        for i, n in enumerate([3, 6])
    ]
    padded = jnp.zeros((2, 6), jnp.int32)
    for i, r in enumerate(rows):
        padded = padded.at[i, : r.shape[1]].set(r[0])
    lens = jnp.asarray([3, 6], jnp.int32)
    want = serving.generate(lm, padded, 5, prompt_lens=lens)
    got = serving.generate_speculative(
        lm, draft, padded, 5, k=2, prompt_lens=lens
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def make_hybrid(version: int, key=18):
    from ptdeco_tpu.models import ssm

    mamba_cfg = (
        ssm.MambaConfig(
            dim=32, d_inner=32, d_state=4, d_conv=3, dt_rank=4, version=1
        )
        if version == 1
        else ssm.MambaConfig(
            dim=32, d_inner=32, d_state=4, d_conv=3, version=2,
            n_heads=4, head_dim=8, n_groups=2, chunk_size=4,
        )
    )
    return make_lm(
        key=key,
        layer_types=("mamba", "full_attention"),
        mamba=mamba_cfg,
    )[0]


@pytest.mark.parametrize("version", [1, 2])
def test_hybrid_mamba_prefill_and_decode(version):
    """bamba/jamba-style hybrids: the cached forward must reproduce the
    uncached model — the SSM layers carry conv-tail + recurrence state
    instead of K/V slots."""
    lm = make_hybrid(version)
    ids = jax.random.randint(jax.random.PRNGKey(50), (2, 7), 0, 64)
    ref = lm({"input_ids": ids})
    caches = serving.init_cache(lm, 2, 12)
    # layer 0 is the mamba layer: (conv_state, ssm_state), not slot caches
    assert caches[0][0].shape[1] == 2  # d_conv - 1
    got, caches = serving.forward_with_cache(lm, ids, caches, 0)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-4
    )
    nxt = jnp.argmax(got[:, -1:, :], axis=-1).astype(jnp.int32)
    ext = jnp.concatenate([ids, nxt], axis=1)
    ref2 = lm({"input_ids": ext})[:, -1, :]
    got2, _ = serving.forward_with_cache(lm, nxt, caches, 7)
    np.testing.assert_allclose(
        np.asarray(got2[:, 0, :]), np.asarray(ref2), atol=2e-4
    )


@pytest.mark.parametrize("version", [1, 2])
def test_hybrid_mamba_generate(version):
    lm = make_hybrid(version, key=19)
    prompt = jax.random.randint(jax.random.PRNGKey(51), (2, 5), 0, 64)
    want = naive_greedy(lm, prompt, 6)
    got = serving.generate(lm, prompt, 6)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_hybrid_mamba_ragged_and_speculative_refused():
    lm = make_hybrid(1, key=20)
    prompt = jnp.zeros((2, 5), jnp.int32)
    with pytest.raises(ValueError, match="ragged decode"):
        serving.generate(
            lm, prompt, 3, prompt_lens=jnp.asarray([3, 5], jnp.int32)
        )
    with pytest.raises(ValueError, match="speculative"):
        serving.generate_speculative(lm, lm, prompt, 3)


def test_moe_generate():
    """MoE models decode through the cache unchanged (routing is
    per-token and stateless) — mixtral-style top-2 router."""
    lm, _ = make_lm(
        key=80,
        n_experts=4,
        n_experts_per_tok=2,
        moe_hidden_dim=16,
    )
    ids = jax.random.randint(jax.random.PRNGKey(81), (2, 6), 0, 64)
    ref = lm({"input_ids": ids})
    got, _ = serving.forward_with_cache(
        lm, ids, serving.init_cache(lm, 2, 10), 0
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    prompt = ids[:, :4]
    want = naive_greedy(lm, prompt, 5)
    out = serving.generate(lm, prompt, 5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


LINEAR_MIXER_CFGS = {
    "gdn": dict(  # qwen3_next gated DeltaNet
        layer_types=("linear_attention", "full_attention"),
        gdn=(2, 4, 8, 8, 3),
    ),
    "rglru": dict(  # griffin / recurrent_gemma temporal block
        layer_types=("recurrent", "full_attention"),
        rglru=(32, 3, 4),
    ),
    "conv": dict(  # lfm2 gated short-conv mixer
        layer_types=("conv", "full_attention"),
        conv_mixer=(3, True),
    ),
    "lightning": dict(  # minimax lightning (linear) attention
        layer_types=("linear_attention", "full_attention"),
        lightning_block_size=4,
    ),
}


@pytest.mark.parametrize("kind", sorted(LINEAR_MIXER_CFGS))
def test_linear_mixer_prefill_and_decode(kind):
    """DeltaNet/RG-LRU/short-conv hybrids decode through the state cache
    and must reproduce the uncached model."""
    lm, _ = make_lm(key=70, **LINEAR_MIXER_CFGS[kind])
    ids = jax.random.randint(jax.random.PRNGKey(71), (2, 7), 0, 64)
    ref = lm({"input_ids": ids})
    caches = serving.init_cache(lm, 2, 12)
    got, caches = serving.forward_with_cache(lm, ids, caches, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
    nxt = jnp.argmax(got[:, -1:, :], axis=-1).astype(jnp.int32)
    ext = jnp.concatenate([ids, nxt], axis=1)
    ref2 = lm({"input_ids": ext})[:, -1, :]
    got2, _ = serving.forward_with_cache(lm, nxt, caches, 7)
    np.testing.assert_allclose(
        np.asarray(got2[:, 0, :]), np.asarray(ref2), atol=2e-4
    )


@pytest.mark.parametrize("kind", sorted(LINEAR_MIXER_CFGS))
def test_linear_mixer_generate(kind):
    lm, _ = make_lm(key=72, **LINEAR_MIXER_CFGS[kind])
    prompt = jax.random.randint(jax.random.PRNGKey(73), (2, 5), 0, 64)
    want = naive_greedy(lm, prompt, 6)
    got = serving.generate(lm, prompt, 6)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_diffllama_generate():
    """diffllama differential attention decodes through its own cached
    variant (paired-half softmax subtraction against the cache)."""
    lm, _ = make_lm(key=85, diff_attention=True, n_kv_heads=2)
    ids = jax.random.randint(jax.random.PRNGKey(86), (2, 6), 0, 64)
    ref = lm({"input_ids": ids})
    got, caches = serving.forward_with_cache(
        lm, ids, serving.init_cache(lm, 2, 10), 0
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    nxt = jnp.argmax(got[:, -1:, :], axis=-1).astype(jnp.int32)
    ref2 = lm({"input_ids": jnp.concatenate([ids, nxt], 1)})[:, -1, :]
    got2, _ = serving.forward_with_cache(lm, nxt, caches, 6)
    np.testing.assert_allclose(
        np.asarray(got2[:, 0, :]), np.asarray(ref2), atol=1e-5
    )
    prompt = ids[:, :4]
    want = naive_greedy(lm, prompt, 5)
    out = serving.generate(lm, prompt, 5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_jetmoe_moa_generate():
    """jetmoe mixture-of-attention: shared-KV cache + stateless per-token
    expert routing."""
    lm, _ = make_lm(
        key=95,
        moa=True,
        n_experts=4,
        n_experts_per_tok=2,
        n_kv_heads=2,
        moe_hidden_dim=16,
    )
    ids = jax.random.randint(jax.random.PRNGKey(96), (2, 6), 0, 64)
    ref = lm({"input_ids": ids})
    got, caches = serving.forward_with_cache(
        lm, ids, serving.init_cache(lm, 2, 10), 0
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    nxt = jnp.argmax(got[:, -1:, :], axis=-1).astype(jnp.int32)
    ref2 = lm({"input_ids": jnp.concatenate([ids, nxt], 1)})[:, -1, :]
    got2, _ = serving.forward_with_cache(lm, nxt, caches, 6)
    np.testing.assert_allclose(
        np.asarray(got2[:, 0, :]), np.asarray(ref2), atol=1e-5
    )
    prompt = ids[:, :4]
    want = naive_greedy(lm, prompt, 5)
    out = serving.generate(lm, prompt, 5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_longcat_dual_mla_generate():
    """longcat_flash dual-sublayer MLA blocks: two absorbed-latent caches
    per layer, plus the shortcut MoE (stateless)."""
    lm, _ = make_lm(
        key=88,
        longcat_dual=True,
        kv_lora_rank=16,
        q_lora_rank=16,
        qk_nope_head_dim=8,
        qk_rope_head_dim=4,
        v_head_dim=8,
        n_experts=3,
        n_zero_experts=2,
        n_experts_per_tok=2,
        moe_hidden_dim=16,
        router_correction_bias=True,
    )
    ids = jax.random.randint(jax.random.PRNGKey(89), (2, 6), 0, 64)
    ref = lm({"input_ids": ids})
    caches = serving.init_cache(lm, 2, 10)
    assert len(caches[0]) == 2 and caches[0][0][0].shape == (2, 10, 16)
    got, caches = serving.forward_with_cache(lm, ids, caches, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    prompt = ids[:, :4]
    want = naive_greedy(lm, prompt, 5)
    out = serving.generate(lm, prompt, 5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_falcon_h1_parallel_hybrid_generate():
    """falcon_h1: EVERY layer runs attention and a mamba2 mixer in
    parallel — the cache entry is ((k, v), (conv, state)) and both mixers
    are swapped."""
    from ptdeco_tpu.models import ssm

    lm, _ = make_lm(
        key=75,
        parallel_ssm=True,
        mamba=ssm.MambaConfig(
            dim=32, d_inner=32, d_state=4, d_conv=3, version=2,
            n_heads=4, head_dim=8, n_groups=2, chunk_size=4,
        ),
    )
    ids = jax.random.randint(jax.random.PRNGKey(76), (2, 6), 0, 64)
    ref = lm({"input_ids": ids})
    caches = serving.init_cache(lm, 2, 10)
    assert isinstance(caches[0][0], tuple)  # nested ((k, v), (conv, st))
    got, caches = serving.forward_with_cache(lm, ids, caches, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
    prompt = ids[:, :4]
    want = naive_greedy(lm, prompt, 5)
    out = serving.generate(lm, prompt, 5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
    with pytest.raises(ValueError, match="ragged"):
        serving.generate(
            lm, prompt, 3, prompt_lens=jnp.asarray([2, 4], jnp.int32)
        )


@pytest.mark.parametrize("version", [1, 2])
def test_pure_mamba_lm_generate(version):
    """Pure MambaLM stacks (mamba/mamba2/falcon_mamba checkpoints) decode
    through the same cache path."""
    from ptdeco_tpu.models import ssm

    cfg = ssm.MambaConfig(
        vocab_size=64, dim=32, n_layers=2, d_inner=64, d_state=4,
        d_conv=3, dt_rank=4, version=version, n_heads=4, head_dim=16,
        n_groups=2, chunk_size=4,
    )
    lm = ssm.MambaLM.create(jax.random.PRNGKey(60), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(61), (2, 6), 0, 64)
    ref = lm({"input_ids": ids})
    got, caches = serving.forward_with_cache(
        lm, ids, serving.init_cache(lm, 2, 12), 0
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
    prompt = ids[:, :4]
    want = naive_greedy(lm, prompt, 5)
    out = serving.generate(lm, prompt, 5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_rwkv_generate():
    """RWKV decodes through per-block shift + WKV-carry state."""
    from ptdeco_tpu.models import ssm

    cfg = ssm.RwkvConfig(
        vocab_size=64, dim=32, n_layers=2, hidden_dim=64, attn_dim=32,
    )
    lm = ssm.RwkvLM.create(jax.random.PRNGKey(100), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(101), (2, 6), 0, 64)
    ref = lm({"input_ids": ids})
    caches = serving.init_cache(lm, 2, 10)
    got, caches = serving.forward_with_cache(lm, ids, caches, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
    nxt = jnp.argmax(got[:, -1:, :], axis=-1).astype(jnp.int32)
    ref2 = lm({"input_ids": jnp.concatenate([ids, nxt], 1)})[:, -1, :]
    got2, _ = serving.forward_with_cache(lm, nxt, caches, 6)
    np.testing.assert_allclose(
        np.asarray(got2[:, 0, :]), np.asarray(ref2), atol=2e-4
    )
    prompt = ids[:, :4]
    want = naive_greedy(lm, prompt, 5)
    out = serving.generate(lm, prompt, 5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
    with pytest.raises(ValueError, match="ragged|SSM"):
        serving.generate(
            lm, prompt, 3, prompt_lens=jnp.asarray([2, 4], jnp.int32)
        )


@pytest.mark.parametrize("version", [1, 2])
def test_zamba_generate(version):
    """Zamba v1/v2: multi-head mamba layers with a shared transformer
    block on hybrid layers — the cache entry pairs the shared attention's
    K/V (over cat(hidden, embedding) inputs) with the mamba state."""
    from ptdeco_tpu.models import ssm

    cfg = ssm.ZambaConfig(
        vocab_size=64,
        dim=32,
        n_layers=4,
        layers_block_type=("mamba", "hybrid", "mamba", "hybrid"),
        attention_hidden_size=64,
        n_attn_heads=4,
        attention_head_dim=16,
        intermediate_size=48,
        d_inner=64,
        d_state=4,
        d_conv=3,
        n_mamba_heads=2,
        dt_rank=2,
        version=version,
        mamba_headdim=32,  # v2: n_mamba_heads * headdim == d_inner
        n_groups=2,
        chunk_size=4,
        use_mem_rope=(version == 2),
    )
    lm = ssm.ZambaLM.create(jax.random.PRNGKey(110), cfg)
    ids = jax.random.randint(jax.random.PRNGKey(111), (2, 6), 0, 64)
    ref = lm({"input_ids": ids})
    caches = serving.init_cache(lm, 2, 10)
    assert caches[0][0] is None  # mamba-only layer: no attention KV
    assert caches[1][0] is not None  # hybrid layer: shared-attn KV
    got, caches = serving.forward_with_cache(lm, ids, caches, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)
    nxt = jnp.argmax(got[:, -1:, :], axis=-1).astype(jnp.int32)
    ref2 = lm({"input_ids": jnp.concatenate([ids, nxt], 1)})[:, -1, :]
    got2, _ = serving.forward_with_cache(lm, nxt, caches, 6)
    np.testing.assert_allclose(
        np.asarray(got2[:, 0, :]), np.asarray(ref2), atol=2e-4
    )
    prompt = ids[:, :4]
    want = naive_greedy(lm, prompt, 5)
    out = serving.generate(lm, prompt, 5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))


def test_doge_generate_and_window_refusal():
    """doge dynamic-mask attention decodes: the per-key bias depends only
    on v at that key's position, so it caches alongside k/v.  Cache
    lengths beyond keep_window_size (where HF's top-k masking would
    engage) are refused."""
    lm, _ = make_lm(key=18, dyn_mask_keep_window=64, residual_scales=True)
    ids = jax.random.randint(jax.random.PRNGKey(19), (2, 6), 0, 64)
    ref = lm({"input_ids": ids})
    caches = serving.init_cache(lm, 2, 10)
    assert len(caches[0]) == 3  # (k, v, dyn bias)
    got, caches = serving.forward_with_cache(lm, ids, caches, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    nxt = jnp.argmax(got[:, -1:, :], axis=-1).astype(jnp.int32)
    ref2 = lm({"input_ids": jnp.concatenate([ids, nxt], 1)})[:, -1, :]
    got2, _ = serving.forward_with_cache(lm, nxt, caches, 6)
    np.testing.assert_allclose(
        np.asarray(got2[:, 0, :]), np.asarray(ref2), atol=1e-5
    )
    prompt = ids[:, :4]
    want = naive_greedy(lm, prompt, 5)
    out = serving.generate(lm, prompt, 5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(want))
    with pytest.raises(ValueError, match="keep_window"):
        serving.init_cache(lm, 1, 65)


def naive_beam(lm, prompt_row, n_new, m, eos_id=None, length_penalty=1.0):
    """Single-row beam-search oracle: full uncached re-forward per beam
    per step, float64 score bookkeeping, same semantics as
    serving.generate_beam (finished beams freeze and emit eos; final
    ranking divides by len**length_penalty with len counting through the
    first eos).  Taking each beam's own top-m continuations is exhaustive:
    the global top-m can contain at most m children of any one parent."""
    seq0 = [int(t) for t in np.asarray(prompt_row)]

    def step_lp(seq):
        logits = lm({"input_ids": jnp.asarray([seq], jnp.int32)})[0, -1]
        return np.asarray(jax.nn.log_softmax(logits.astype(jnp.float32)))

    lp = step_lp(seq0)
    beams = [
        ([int(t)], float(lp[t]), eos_id is not None and int(t) == eos_id)
        for t in np.argsort(-lp)[:m]
    ]
    for _ in range(n_new - 1):
        cand = []
        for new, s, fin in beams:
            if fin:
                cand.append((new + [eos_id], s, True))
                continue
            lp = step_lp(seq0 + new)
            for t in np.argsort(-lp)[:m]:
                cand.append(
                    (
                        new + [int(t)],
                        s + float(lp[t]),
                        eos_id is not None and int(t) == eos_id,
                    )
                )
        cand.sort(key=lambda c: -c[1])
        beams = cand[:m]

    def plen(new):
        if eos_id is not None and eos_id in new:
            return new.index(eos_id) + 1
        return len(new)

    best = max(beams, key=lambda c: c[1] / plen(c[0]) ** length_penalty)
    return best[0], best[1] / plen(best[0]) ** length_penalty


def test_beam_matches_naive():
    lm, _ = make_lm(key=110)
    prompt = jax.random.randint(jax.random.PRNGKey(111), (2, 4), 0, 64)
    got, scores = serving.generate_beam(
        lm, prompt, 6, num_beams=3, return_scores=True
    )
    for b in range(2):
        want, want_score = naive_beam(lm, prompt[b], 6, 3)
        assert np.asarray(got[b]).tolist() == want
        np.testing.assert_allclose(
            float(scores[b]), want_score, atol=2e-4
        )


def test_beam_one_equals_greedy():
    lm, _ = make_lm(key=112)
    prompt = jax.random.randint(jax.random.PRNGKey(113), (2, 4), 0, 64)
    want = serving.generate(lm, prompt, 5)
    got = serving.generate_beam(lm, prompt, 5, num_beams=1)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_beam_eos_and_length_penalty():
    """Force a mid-sequence eos (a token the no-eos run actually emits)
    and a non-trivial length penalty; finished-beam freezing and the
    length-normalized final ranking must match the oracle."""
    lm, _ = make_lm(key=114)
    prompt = jax.random.randint(jax.random.PRNGKey(115), (2, 4), 0, 64)
    free = serving.generate_beam(lm, prompt, 6, num_beams=3)
    eos = int(free[0, 2])  # appears mid-sequence -> some beam finishes
    got, scores = serving.generate_beam(
        lm, prompt, 6, num_beams=3, eos_id=eos, length_penalty=2.0,
        return_scores=True,
    )
    for b in range(2):
        want, want_score = naive_beam(
            lm, prompt[b], 6, 3, eos_id=eos, length_penalty=2.0
        )
        assert np.asarray(got[b]).tolist() == want
        np.testing.assert_allclose(
            float(scores[b]), want_score, atol=2e-4
        )


def test_beam_ragged():
    """Right-padded ragged prompts: each row's beam walk must equal the
    oracle on that row's UNPADDED prompt."""
    lm, _ = make_lm(key=116)
    r0 = jax.random.randint(jax.random.PRNGKey(117), (6,), 0, 64)
    r1 = jax.random.randint(jax.random.PRNGKey(118), (4,), 0, 64)
    padded = jnp.stack([r0, jnp.concatenate([r1, jnp.zeros(2, r1.dtype)])])
    got = serving.generate_beam(
        lm, padded, 5, num_beams=3,
        prompt_lens=jnp.asarray([6, 4], jnp.int32),
    )
    for b, row in enumerate([r0, r1]):
        want, _ = naive_beam(lm, row, 5, 3)
        assert np.asarray(got[b]).tolist() == want


@pytest.mark.parametrize("version", [1, 2])
def test_beam_on_hybrid_mamba(version):
    """Beam search over a mamba-hybrid: the per-step batch-axis gather
    must reorder the recurrent conv/SSM state to the surviving parents,
    not just K/V slots."""
    lm = make_hybrid(version, key=119)
    prompt = jax.random.randint(jax.random.PRNGKey(120), (2, 5), 0, 64)
    got = serving.generate_beam(lm, prompt, 5, num_beams=3)
    for b in range(2):
        want, _ = naive_beam(lm, prompt[b], 5, 3)
        assert np.asarray(got[b]).tolist() == want


def test_cli_generate_task(tmp_path):
    """The trainer CLI's `generate` task end-to-end: original model and a
    decomposed checkpoint, ragged prompt batch, generations.jsonl +
    tokens/s summary."""
    import json

    from apps.trainer_llm import run_generate

    (tmp_path / "builder.py").write_text(
        "import jax\n"
        "from ptdeco_tpu import models\n"
        "from apps.trainer_llm.builder import ByteTokenizer\n"
        "def make_model_and_tokenizer(config):\n"
        "    cfg = models.TransformerConfig.tiny()\n"
        "    return (models.CausalLM.create(jax.random.PRNGKey(0), cfg),\n"
        "            ByteTokenizer(256))\n"
    )
    prompts = tmp_path / "prompts.jsonl"
    prompts.write_text(
        "\n".join(
            json.dumps({"text": t})
            for t in ["the quick brown", "low rank", "tokens flow through"]
        )
    )
    cfg = dict(
        task="generate",
        decomposed_model_name="tiny-test",
        decomposed_model_custom_builder_path=str(tmp_path / "builder.py"),
        decomposed_model_dtype="float32",
        prompts_file=str(prompts),
        max_new_tokens=6,
        batch_size=2,
        stop_at_eos=False,
    )
    out = tmp_path / "out"
    run_generate.main(cfg, out)
    rows = [
        json.loads(ln)
        for ln in (out / "generations.jsonl").read_text().splitlines()
    ]
    assert len(rows) == 3
    assert all(r["n_new_tokens"] == 6 for r in rows)
    summary = json.loads((out / "summary.json").read_text())
    assert summary["n_prompts"] == 3 and summary["decomposed"] is False
    assert summary["tokens_per_s"] > 0

    # decomposed checkpoint path: produce an artifact with the library,
    # reload it through the CLI task
    from ptdeco_tpu import utils as ut

    lm, _ = make_lm(
        key=0, vocab_size=256, dim=64, n_heads=4, n_kv_heads=2,
        hidden_dim=128,
    )

    def data_iter(key):
        while True:
            key, sub = jax.random.split(key)
            yield {"input_ids": jax.random.randint(sub, (2, 8), 0, 256)}

    names = engine.get_decomposeable_submodule_names(lm)
    keep = {"model.layers.0.mlp.up_proj"}
    deco, config = dwain.decompose(
        module=lm,
        data_iterator=data_iter(jax.random.PRNGKey(1)),
        loss_fn=models.ce_loss,
        num_data_steps=1,
        metric_iterator=data_iter(jax.random.PRNGKey(2)),
        num_metric_steps=1,
        nsr_final_threshold=1e9,
        blacklisted_module_names=[n for n in names if n not in keep],
        min_rank=2,
        trade_off_factor=1e9,
        max_accepted_ppl_diff=1e9,
    )
    with open(tmp_path / "decompose_config.json", "w") as f:
        json.dump(config, f)
    ut.save_state_dict_pt(
        ut.state_dict(deco), str(tmp_path / "decompose_state_dict.pt")
    )
    cfg2 = dict(
        cfg,
        decompose_config=str(tmp_path / "decompose_config.json"),
        decompose_state_dict=str(tmp_path / "decompose_state_dict.pt"),
    )
    out2 = tmp_path / "out2"
    run_generate.main(cfg2, out2)
    summary2 = json.loads((out2 / "summary.json").read_text())
    assert summary2["decomposed"] is True

    # beam-search path through the CLI (ragged batch, num_beams=2)
    cfg3 = dict(cfg, num_beams=2)
    out3 = tmp_path / "out3"
    run_generate.main(cfg3, out3)
    summary3 = json.loads((out3 / "summary.json").read_text())
    assert summary3["num_beams"] == 2 and summary3["tokens_per_s"] > 0
    with pytest.raises(ValueError, match="temperature"):
        run_generate.main(
            dict(cfg, num_beams=2, temperature=0.5), tmp_path / "bad"
        )
    # sampling filters would be silently dropped by beam search: refuse
    with pytest.raises(ValueError, match="repetition_penalty"):
        run_generate.main(
            dict(cfg, num_beams=2, repetition_penalty=1.3),
            tmp_path / "bad2",
        )

    # speculative serving through the CLI: the decomposed artifact drafts
    # for the ORIGINAL model — generations must equal the original-only
    # run byte for byte (speculative is exact); summary records
    # acceptance.  auto_gate off: this is a correctness drive, the
    # CPU-measured gate decision is irrelevant here.
    cfg4 = dict(
        cfg2,
        speculative=True,
        speculative_k=2,
        speculative_auto_gate=False,
    )
    out4 = tmp_path / "out4"
    run_generate.main(cfg4, out4)
    assert (out4 / "generations.jsonl").read_text() == (
        out / "generations.jsonl"
    ).read_text()
    summary4 = json.loads((out4 / "summary.json").read_text())
    assert summary4["speculative"]["rounds"] >= 1
    assert 0.0 <= summary4["speculative"]["acceptance"] <= 1.0
    with pytest.raises(ValueError, match="draft"):
        run_generate.main(
            dict(cfg, speculative=True), tmp_path / "bad3"
        )
    with pytest.raises(ValueError, match="greedy"):
        run_generate.main(
            dict(cfg4, temperature=0.5), tmp_path / "bad4"
        )


def test_max_len_validation():
    lm, _ = make_lm(key=19)
    prompt = jnp.zeros((1, 4), jnp.int32)
    with pytest.raises(ValueError, match="max_len"):
        serving.generate(lm, prompt, 8, max_len=6)


# ---------------------------------------------------------------------------
# flash-kernel prefill fast path: a cached prefill from an empty cache is
# exactly plain causal attention over the new tokens, so CachedAttention
# dispatches it to ops.flash_attention instead of materializing the
# (b, h, s, max_len) f32 logits.  The predicate must only fire when that
# equivalence holds.


def test_flash_prefill_predicate(monkeypatch):
    lm, _ = make_lm(key=21, dtype=jnp.bfloat16)
    a = lm.model.layers[0].self_attn
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert serving._flash_prefill_ok(a, 256, 8, jnp.bfloat16, None, None)
    # refusals: decode step, non-128 seqlen, f32, left-pad mask
    assert not serving._flash_prefill_ok(a, 1, 8, jnp.bfloat16, None, None)
    assert not serving._flash_prefill_ok(
        a, 100, 8, jnp.bfloat16, None, None
    )
    assert not serving._flash_prefill_ok(
        a, 256, 8, jnp.float32, None, None
    )
    assert not serving._flash_prefill_ok(
        a, 256, 8, jnp.bfloat16, jnp.ones((2, 12), bool), None
    )
    # feature-bearing attention variants refuse
    lm2, _ = make_lm(key=22, dtype=jnp.bfloat16, **VARIANTS["gptossish"])
    a2 = lm2.model.layers[0].self_attn  # sliding + sinks
    assert not serving._flash_prefill_ok(
        a2, 256, 8, jnp.bfloat16, None, None
    )


def test_is_static_zero():
    """prefill_causal gating: only a trace-time-KNOWN scalar zero counts
    — under jit even the literal 0 stages into a tracer after asarray,
    so the check runs on the caller's original argument."""
    assert serving._is_static_zero(0)
    assert serving._is_static_zero(jnp.asarray(0, jnp.int32))
    assert serving._is_static_zero(np.int32(0))
    assert not serving._is_static_zero(3)
    assert not serving._is_static_zero(jnp.zeros((2,), jnp.int32))
    seen = []

    def probe(cp):
        seen.append(serving._is_static_zero(cp))
        return cp

    jax.jit(probe)(jnp.asarray(0, jnp.int32))
    assert seen == [False]
    # ...but a LITERAL zero closed over inside jit stays static: generate
    # prefills exactly this way
    seen2 = []

    def probe2(x):
        seen2.append(serving._is_static_zero(0))
        return x

    jax.jit(probe2)(jnp.zeros(()))
    assert seen2 == [True]


def test_flash_prefill_path_matches_einsum(monkeypatch):
    """Force the fast path on CPU (where ops.flash_attention lowers to its
    einsum reference): logits, cache contents, and the subsequent decode
    step must match the normal grouped-contraction path."""
    lm, _ = make_lm(key=23)  # f32, GQA rep=2 exercises the head repeat
    ids = jax.random.randint(jax.random.PRNGKey(24), (2, 7), 0, 64)
    caches = serving.init_cache(lm, 2, 12)
    ref, ref_caches = serving.forward_with_cache(lm, ids, caches, 0)

    fired = []

    def fake(a, s, hd, q_dtype, kv_mask, dyn_cache):
        # the real gates minus backend/dtype/128-alignment (CPU test);
        # prefill_causal still gates the call site, so decode steps and
        # nonzero cache_pos never reach here with the flag set
        ok = (
            s > 1
            and kv_mask is None
            and dyn_cache is None
            and a.logit_softcap is None
            and a.sinks is None
            and a.sliding_window is None
            and not a.use_alibi
            and a.chunk_size is None
        )
        fired.append(ok)
        return ok

    monkeypatch.setattr(serving, "_flash_prefill_ok", fake)
    got, got_caches = serving.forward_with_cache(lm, ids, caches, 0)
    assert any(fired)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    # layer-0 K/V are written before any flash-vs-einsum numeric
    # divergence can enter; deeper layers project a (tolerably) different
    # x, so they match to float tolerance only
    for i, ((rk, rv), (gk, gv)) in enumerate(zip(ref_caches, got_caches)):
        assert_fn = (
            np.testing.assert_array_equal
            if i == 0
            else lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5)
        )
        assert_fn(np.asarray(rk), np.asarray(gk))
        assert_fn(np.asarray(rv), np.asarray(gv))
    # decode continuation off the fast-path-built cache matches the oracle
    nxt = jnp.argmax(got[:, -1:, :], axis=-1).astype(jnp.int32)
    got2, _ = serving.forward_with_cache(lm, nxt, got_caches, 7)
    ref2 = lm({"input_ids": jnp.concatenate([ids, nxt], axis=1)})[:, -1, :]
    np.testing.assert_allclose(
        np.asarray(got2[:, 0, :]), np.asarray(ref2), atol=1e-5
    )


def test_speculative_auto_gate(monkeypatch):
    """VERDICT r3 #1: the auto-gate measures step costs on the live
    device and falls back to plain generate when drafting cannot pay;
    output is identical on BOTH branches (speculative is exact)."""
    lm, _ = make_lm(key=70)
    draft = decompose_all(
        lm, keep=["model.layers.0.mlp.up_proj"], min_rank=8
    )
    prompt = jax.random.randint(jax.random.PRNGKey(71), (2, 5), 0, 64)
    want = serving.generate(lm, prompt, 7)

    # real measurement path: returns sane positive costs and a finite
    # estimate (decision itself is hardware-dependent — not asserted)
    est = serving.estimate_speculative_speedup(lm, draft, 2, k=3)
    assert est["target_step_s"] > 0 and est["draft_step_s"] > 0
    assert est["expected_tokens_per_round"] > 1
    assert est["expected_speedup"] > 0

    # force the gate CLOSED (default basis = throughput probe): fallback
    # to plain generate, gate recorded
    def fake_probe(speedup):
        return lambda *a, **kw: {
            "measured_speedup": speedup, "acceptance": 0.9,
            "probe_tokens": 4, "speculative_probe_s": 0.1,
            "dense_probe_s": 0.1 * speedup,
        }

    monkeypatch.setattr(
        serving, "measure_speculative_speedup_probe", fake_probe(0.6)
    )
    got, stats = serving.generate_speculative(
        lm, draft, prompt, 7, k=3, return_stats=True, auto_gate=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert stats["gate"]["used_speculative"] is False
    assert stats["gate"]["basis"] == "measured_probe_throughput"
    assert stats["rounds"] == 0

    # force the gate OPEN: the speculative path runs, still exact
    monkeypatch.setattr(
        serving, "measure_speculative_speedup_probe", fake_probe(2.4)
    )
    got2, stats2 = serving.generate_speculative(
        lm, draft, prompt, 7, k=3, return_stats=True, auto_gate=True
    )
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(want))
    assert stats2["gate"]["used_speculative"] is True
    assert stats2["rounds"] >= 1


def test_speculative_gate_measures_acceptance():
    """VERDICT r4 #3: the gate must MEASURE acceptance with a real
    drafting probe instead of assuming 0.9 (an assumed 0.9 once predicted
    1.78x where reality was 0.70x).  With identical step costs, the
    measured acceptance alone must be able to flip the decision."""
    lm, _ = make_lm(key=72)
    draft = decompose_all(
        lm, keep=["model.layers.0.mlp.up_proj"], min_rank=8
    )
    prompt = jax.random.randint(jax.random.PRNGKey(73), (2, 5), 0, 64)
    want = serving.generate(lm, prompt, 7)

    # weight-streaming-favorable fake costs: pays iff acceptance is high
    # (a=0.9 -> ~1.9x, a=0.0 -> 0.6x with these numbers)
    costs = {
        "target_step_s": 3e-3, "target_verify_s": 3e-3,
        "draft_step_s": 4e-4,
    }

    # probe path: acceptance measured on these prompts, source recorded
    got, stats = serving.generate_speculative(
        lm, draft, prompt, 7, k=3, return_stats=True, auto_gate=True,
        costs=costs, probe_tokens=8,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    gate = stats["gate"]
    assert gate["acceptance_source"] == "measured_probe"
    assert 0.0 <= gate["probe"]["acceptance"] <= 1.0
    assert gate["probe"]["drafted"] > 0
    assert gate["assumed_acceptance"] == gate["probe"]["acceptance"]

    # caller-supplied acceptance: zero acceptance closes the gate that
    # identical costs would have left open at high acceptance
    got_lo, stats_lo = serving.generate_speculative(
        lm, draft, prompt, 7, k=3, return_stats=True, auto_gate=True,
        costs=costs, acceptance=0.0,
    )
    np.testing.assert_array_equal(np.asarray(got_lo), np.asarray(want))
    assert stats_lo["gate"]["used_speculative"] is False
    assert stats_lo["gate"]["acceptance_source"] == "caller"
    got_hi, stats_hi = serving.generate_speculative(
        lm, draft, prompt, 7, k=3, return_stats=True, auto_gate=True,
        costs=costs, acceptance=0.95,
    )
    np.testing.assert_array_equal(np.asarray(got_hi), np.asarray(want))
    assert stats_hi["gate"]["used_speculative"] is True


def test_speculative_gate_throughput_probe_basis():
    """With no caller-supplied numbers the gate times the REAL loop
    against plain decode (the analytic model undercounts per-round
    bookkeeping: 1.27x predicted vs 0.76x realized at 1.1B even with
    measured acceptance — BENCH_GENERATE r5).  Output exactness holds on
    both forced decisions; the gate records the probe basis."""
    lm, _ = make_lm(key=76)
    draft = decompose_all(
        lm, keep=["model.layers.0.mlp.up_proj"], min_rank=8
    )
    prompt = jax.random.randint(jax.random.PRNGKey(77), (2, 5), 0, 64)
    want = serving.generate(lm, prompt, 7)

    # force OPEN: any measured ratio passes
    got, stats = serving.generate_speculative(
        lm, draft, prompt, 7, k=3, return_stats=True, auto_gate=True,
        min_estimated_speedup=0.0, probe_tokens=4,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    gate = stats["gate"]
    assert gate["used_speculative"] is True
    assert gate["basis"] == "measured_probe_throughput"
    assert gate["probe"]["speculative_probe_s"] > 0
    assert gate["probe"]["dense_probe_s"] > 0
    assert 0.0 <= gate["probe"]["acceptance"] <= 1.0

    # force CLOSED: no measured ratio passes — exact fallback
    got2, stats2 = serving.generate_speculative(
        lm, draft, prompt, 7, k=3, return_stats=True, auto_gate=True,
        min_estimated_speedup=1e9, probe_tokens=4,
    )
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(want))
    assert stats2["gate"]["used_speculative"] is False
    assert stats2["rounds"] == 0


def test_measure_draft_acceptance_self_draft_is_high():
    """A model drafting for itself: near-total acceptance — but NOT
    exactly 1.0, and that is the point of measuring.  The draft scans
    width-1 steps while the target verifies width-(k+1), and argmax can
    flip between the two matmul layouts (here: CPU bf16-default matmuls;
    on chip: the batch-1 collapse to 0.47 in BENCH_GENERATE r4).  The
    probe reports the REALIZED rate, layout flips included."""
    lm, _ = make_lm(key=74)
    prompt = jax.random.randint(jax.random.PRNGKey(75), (2, 4), 0, 64)
    probe = serving.measure_draft_acceptance(
        lm, lm, prompt, k=2, probe_tokens=8
    )
    assert 0.75 <= probe["acceptance"] <= 1.0
    assert probe["drafted"] >= probe["accepted"] > 0
