"""EfficientFormerV2 tests: the reference runs its whole timm test matrix
(wrap / losses / decompose / config round-trip) on ``efficientformerv2_s0``
(/root/reference/tests/test_wrap_torchvision_timm.py:32,
test_losses_torchvision_timm.py:25, test_decompose_torchvision_timm.py:25,
test_config_torchvision_timm.py:25) — mirrored here on the native family."""

import jax
import numpy as np

from ptdeco_tpu import engine, lockd, models, nn, utils
from tests.test_lockd import set_half_logits


def make_s0(key=0, image_size=64, num_classes=10):
    return models.efficientformerv2_s0(
        jax.random.PRNGKey(key), num_classes=num_classes, image_size=image_size
    )


def test_forward_shape_and_sites():
    m = make_s0()
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    y = jax.jit(lambda m, x: m(x))(m, x)
    assert y.shape == (2, 10)
    names = engine.get_decomposeable_submodule_names(m)
    # pointwise FFN convs are sites
    assert "stages.0.blocks.0.mlp.fc1.conv" in names
    assert "stages.0.blocks.0.mlp.fc2.conv" in names
    # attention q/k/v/proj 1x1 convs are sites (last num_vit=2 blocks)
    assert "stages.3.blocks.2.token_mixer.q.conv" in names
    assert "stages.3.blocks.3.token_mixer.proj.conv" in names
    # classifier heads are Linear sites
    assert "head" in names and "head_dist" in names
    # depthwise (grouped) convs are NOT sites
    assert not any(".mid." in n for n in names)
    assert not any("v_local" in n for n in names)
    # 3x3 stem/downsample convs are NOT sites
    assert not any("stem" in n for n in names)
    assert not any("downsample" in n for n in names)


def test_attention_blocks_only_in_final_stage_tail():
    m = make_s0()
    from ptdeco_tpu.models.efficientformer import EFAttnBlock, EFBlock

    for s, stage in enumerate(m.stages.layers):
        kinds = [type(b) for b in stage.blocks.layers]
        if s < 3:
            assert all(k is EFBlock for k in kinds)
        else:
            assert kinds == [EFBlock, EFBlock, EFAttnBlock, EFAttnBlock]


def test_lockd_wrap_shape_and_teacher_parity():
    """Reference test_wrap_torchvision_timm: wrapping preserves output."""
    m = make_s0()
    wrapped = lockd.wrap(m, jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    y0 = m(x)
    y1 = wrapped(x, ctx=nn.Ctx(key=jax.random.PRNGKey(3), train=False))
    assert y1.shape == y0.shape
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-4)
    wrapped_names = [n for n, _ in lockd.named_wrapped_modules(wrapped)]
    # all groups==1 convs and Linears wrapped; depthwise skipped
    assert "stages.0.blocks.0.mlp.fc1.conv" in wrapped_names
    assert "stem0.conv" in wrapped_names  # 3x3 but groups==1 -> lockd-wrappable
    assert "head" in wrapped_names
    assert not any(".mid." in n for n in wrapped_names)


def test_lockd_losses_getters():
    """Reference test_losses_torchvision_timm: loss getters after forward."""
    m = make_s0(image_size=32)
    wrapped = lockd.wrap(m, jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    _, nsr_sink = lockd.forward_collecting(wrapped, x, jax.random.PRNGKey(3))
    assert len(nsr_sink) > 20
    assert np.isfinite(float(lockd.get_nsr_loss(nsr_sink, nsr_threshold=0.01)))
    assert np.isfinite(float(lockd.get_entropy_loss(wrapped)))
    prop = lockd.get_proportion_loss(wrapped)
    np.testing.assert_allclose(float(prop), 1 / (1 + np.exp(-3.0)), atol=1e-5)


def test_lockd_decompose_half_gates_shape():
    """Reference test_decompose_torchvision_timm: decompose runs, shapes
    preserved."""
    m = make_s0(image_size=32)
    wrapped = lockd.wrap(m, jax.random.PRNGKey(1))
    wrapped = set_half_logits(wrapped)
    deco, config = lockd.decompose(wrapped, proportion_threshold=0.9)
    assert len(config) > 20
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    y = deco(x)
    assert y.shape == (2, 10)


def test_config_roundtrip():
    """Reference test_config_torchvision_timm: decompose model1, apply
    config+sd to a fresh model2, outputs must match."""
    m1 = make_s0(key=0, image_size=32)
    wrapped = lockd.wrap(m1, jax.random.PRNGKey(1))
    wrapped = set_half_logits(wrapped)
    model1, dc = lockd.decompose(wrapped, proportion_threshold=0.9)
    sd = utils.state_dict(model1)

    model2 = make_s0(key=42, image_size=32)
    model2 = utils.apply_decompose_config(model2, dc)
    model2 = utils.load_state_dict(model2, sd)

    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    np.testing.assert_allclose(
        np.asarray(model1(x)), np.asarray(model2(x)), atol=1e-5
    )


def test_builder_zoo_alias():
    from apps.trainer_vision import builder

    m = builder.make_model("efficientformerv2_s0", num_classes=7)
    assert isinstance(m, models.EfficientFormerV2)
    assert m.head.kernel.shape[-1] == 7
