"""timm checkpoint-layout bridge (VERDICT r3 #7).

The reference's vision builder loads ANY timm model
(/root/reference/examples/trainer_vision/builder.py:134-144); its two
example configs target ``swinv2_cr_tiny_ns_224`` and
``efficientformerv2_s0``.  timm is absent from this offline image, so:

  * the efficientformerv2 tests here run the translator against a
    SYNTHETIC state dict in the documented timm layout (both the timm
    and the snap-research original spellings) — pinning the rename rules
    and the loud attention-downsample refusal offline;
  * ``test_timm_live_parity`` skips without timm and, in any
    timm-bearing environment, builds the real model, translates its
    state dict, and pins logits parity — the test that "lights up" to
    verify (or fail naming the drifted keys of) the offline-derived
    mapping;
  * swinv2_cr is asserted to REFUSE loudly (structurally different
    graph — silently loading it onto official SwinV2 would compute the
    wrong function).
"""

import importlib.util

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptdeco_tpu import models, utils
from ptdeco_tpu.models import efficientformer as ef
from ptdeco_tpu.models import swin as swin_zoo

HAS_TIMM = importlib.util.find_spec("timm") is not None


def native_to_timm_sd(model, style="timm"):
    """Render the native state dict under the documented timm (or
    snap-research original) spellings — the synthetic round-trip oracle."""
    import re

    sd = utils.state_dict(model)
    out = {}
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if style == "timm":
            if k.startswith("stem0."):
                k = "stem.conv1." + k[len("stem0."):]
            elif k.startswith("stem1."):
                k = "stem.conv2." + k[len("stem1."):]
        else:
            # the snap-research original's stem is a plain Sequential
            # named patch_embed: conv,bn,act,conv,bn (ADVICE r4 medium:
            # these keys previously sniffed the translator but had no rule)
            k = k.replace("stem0.conv.", "patch_embed.0.")
            k = k.replace("stem0.bn.", "patch_embed.1.")
            k = k.replace("stem1.conv.", "patch_embed.3.")
            k = k.replace("stem1.bn.", "patch_embed.4.")
        k = re.sub(r"downsample\.(conv|bn)\.", r"downsample.conv.\1.", k)
        if style == "timm":
            k = re.sub(r"\.ls([12])$", r".ls\1.gamma", k)
            k = re.sub(
                r"token_mixer\.proj\.(conv|bn)\.",
                r"token_mixer.proj.1.\1.", k,
            )
        else:  # snap-research original
            if re.search(r"\.ls([12])$", k):
                k = re.sub(r"\.ls([12])$", r".layer_scale_\1", k)
                v = v.reshape(v.shape + (1, 1))  # (C,1,1) parameter
            k = re.sub(r"token_mixer\.proj\.conv\.", r"token_mixer.proj.1.", k)
            k = re.sub(r"token_mixer\.proj\.bn\.", r"token_mixer.proj.2.", k)
            k = re.sub(
                r"token_mixer\.(q|k|v|v_local)\.conv\.", r"token_mixer.\1.0.", k
            )
            k = re.sub(
                r"token_mixer\.(q|k|v|v_local)\.bn\.", r"token_mixer.\1.1.", k
            )
        out[k] = v
    return out


@pytest.mark.parametrize("style", ["timm", "original"])
def test_translator_round_trips_synthetic_layout(style):
    """Translating a state dict rendered in the documented timm /
    original spellings must reproduce the native model exactly."""
    m = models.efficientformerv2_s0(jax.random.PRNGKey(0), image_size=224)
    foreign = native_to_timm_sd(m, style=style)
    back = ef.translate_timm_efficientformerv2_state_dict(foreign)
    m2 = models.efficientformerv2_s0(jax.random.PRNGKey(1), image_size=224)
    m2 = utils.load_state_dict(m2, back)  # strict: every key must land
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 224, 224, 3))
    np.testing.assert_allclose(
        np.asarray(m2(x)), np.asarray(m(x)), atol=1e-5
    )


def test_attention_downsample_checkpoints_refused():
    m = models.efficientformerv2_s0(jax.random.PRNGKey(0), image_size=224)
    foreign = native_to_timm_sd(m)
    foreign["stages.3.downsample.attn.q.conv.weight"] = np.zeros(
        (1, 1, 1, 1), np.float32
    )
    with pytest.raises(NotImplementedError, match="attention[ -]downsample"):
        ef.translate_timm_efficientformerv2_state_dict(foreign)


def test_builder_refuses_partially_translated_checkpoint(tmp_path):
    """A translated checkpoint whose produced keys don't all land on the
    model must be refused loudly — under strict=False an unmatched key
    silently leaves part of the model randomly initialized (ADVICE r4
    medium: exactly how an untranslated stem would have slipped through)."""
    from apps.trainer_vision import builder as vb

    m = models.efficientformerv2_s0(jax.random.PRNGKey(0), image_size=224)
    foreign = native_to_timm_sd(m, style="timm")
    # a key the translator has no rule for, in an unknown-to-native spot
    foreign["stages.0.mystery_scale.gamma"] = np.zeros((4,), np.float32)
    import torch

    path = tmp_path / "ckpt.pt"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in foreign.items()},
               str(path))
    with pytest.raises(ValueError, match="absent from the model"):
        vb.make_model("efficientformerv2_s0", checkpoint_path=str(path))


def _native_cr_model():
    """Small _cr model covering every translator rule: downsample,
    extra stage norms, meta MLP, head, patch embed."""
    return models.SwinV2.create(
        jax.random.PRNGKey(0), image_size=32, patch_size=4, embed_dim=16,
        depths=(1, 1), n_heads=(2, 4), window=2, num_classes=10,
        cr=True, extra_norm_stage=True,
    )


def native_to_timm_cr_sd(model):
    """Render the native _cr state dict under timm's
    swin_transformer_v2_cr spellings — the synthetic round-trip oracle
    (same pattern as native_to_timm_sd above)."""
    import re

    out = {}
    for k, v in utils.state_dict(model).items():
        k = k.replace("patch_embed.", "patch_embed.proj.")
        k = k.replace("patch_norm.", "patch_embed.norm.")
        m = re.match(r"stages\.(\d+)\.downsample\.(.*)$", k)
        if m:
            k = f"stages.{int(m.group(1)) + 1}.downsample.{m.group(2)}"
        k = k.replace(".attn.cpb_fc1.", ".attn.meta_mlp.fc1.")
        k = k.replace(".attn.cpb_fc2.", ".attn.meta_mlp.fc2.")
        if k.startswith("head."):
            k = "head.fc." + k[len("head."):]
        if k.endswith(".attn.logit_scale"):
            v = np.asarray(v).reshape(-1)  # timm stores (H,)
        out[k] = v
    return out


def test_swinv2_cr_translator_round_trips_synthetic_layout():
    """VERDICT r4 #6: the _cr architecture is now implemented natively;
    translating a state dict rendered in the documented timm spellings
    must reproduce the native model exactly."""
    m = _native_cr_model()
    foreign = native_to_timm_cr_sd(m)
    back = swin_zoo.translate_timm_swinv2_cr_state_dict(foreign)
    m2 = models.SwinV2.create(
        jax.random.PRNGKey(1), image_size=32, patch_size=4, embed_dim=16,
        depths=(1, 1), n_heads=(2, 4), window=2, num_classes=10,
        cr=True, extra_norm_stage=True,
    )
    m2 = utils.load_state_dict(m2, back)  # strict: every key must land
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
    np.testing.assert_allclose(
        np.asarray(m2(x)), np.asarray(m(x)), atol=1e-5
    )


def test_swinv2_cr_tau_checkpoints_refused():
    """Pre-2022 _cr checkpoints parametrize the temperature as the
    paper's inverse tau; silently converting risks a wrong function —
    refuse loudly naming the keys."""
    foreign = native_to_timm_cr_sd(_native_cr_model())
    foreign["stages.0.blocks.0.attn.tau"] = np.ones((2,), np.float32)
    with pytest.raises(NotImplementedError, match="inverse-tau"):
        swin_zoo.translate_timm_swinv2_cr_state_dict(foreign)


def test_swinv2_cr_builder_dispatch():
    """The trainer builder routes swinv2_cr_* names with _cr-shaped keys
    through the (now functional) translator."""
    from apps.trainer_vision import builder as vb

    foreign = native_to_timm_cr_sd(_native_cr_model())
    translated = vb._translate_external_layout(
        "swinv2_cr_tiny_ns_224", foreign
    )
    assert "stages.0.blocks.0.attn.cpb_fc1.weight" in translated
    assert "patch_norm.weight" in translated


@pytest.mark.skipif(not HAS_TIMM, reason="timm not installed (offline image)")
def test_timm_live_parity_swinv2_cr():
    """In a timm-bearing environment: the native _cr graph + translator
    must reproduce timm's swinv2_cr_tiny_ns_224 logits — the test that
    lights up to verify the offline-derived architecture (VERDICT r4 #6:
    the model behind the reference's own dwain vision config)."""
    import timm
    import torch

    torch.set_num_threads(1)
    tm = timm.create_model("swinv2_cr_tiny_ns_224", pretrained=False)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    native_sd = swin_zoo.translate_timm_swinv2_cr_state_dict(sd)
    m = models.swinv2_cr_tiny_ns(jax.random.PRNGKey(0), image_size=224)
    m = utils.load_state_dict(m, native_sd)
    x = np.random.RandomState(0).randn(1, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(m(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.skipif(not HAS_TIMM, reason="timm not installed (offline image)")
def test_timm_live_parity():
    """In a timm-bearing environment: the offline-derived mapping must
    load the REAL efficientformerv2_s0 weights and reproduce timm's
    logits.  If a rename drifted, load_state_dict fails naming the keys
    — exactly the signal aux/timm_bridge_manifest.py exists to repair."""
    import timm
    import torch

    torch.set_num_threads(1)
    tm = timm.create_model("efficientformerv2_s0", pretrained=False)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    native = ef.translate_timm_efficientformerv2_state_dict(sd)
    m = models.efficientformerv2_s0(jax.random.PRNGKey(0), image_size=224)
    m = utils.load_state_dict(m, native)
    x = np.random.RandomState(0).randn(1, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got = np.asarray(m(jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=2e-4)
