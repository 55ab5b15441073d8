"""Model zoo shape tests + lockd wrap on real architectures (mirrors the
reference's test_wrap_torchvision_timm.py — wrapping preserves output shape
on real models)."""

import jax
import jax.numpy as jnp

from ptdeco_tpu import engine, lockd, models, nn


def test_resnet18_forward_and_sites():
    m = models.resnet18(jax.random.PRNGKey(0), num_classes=10)
    x = jnp.ones((1, 64, 64, 3))
    y = jax.jit(lambda m, x: m(x))(m, x)
    assert y.shape == (1, 10)
    names = engine.get_decomposeable_submodule_names(m)
    assert "fc" in names  # basic blocks have no 1x1s except downsamples
    assert any("downsample.0" in n for n in names)


def test_resnet50_has_1x1_sites():
    m = models.resnet50(jax.random.PRNGKey(0), num_classes=10)
    names = engine.get_decomposeable_submodule_names(m)
    assert "layer1.0.conv1" in names  # bottleneck 1x1
    assert "layer1.0.conv3" in names
    assert "layer1.0.conv2" not in names  # 3x3


def test_convnext_forward_and_sites():
    m = models.ConvNeXt.create(
        jax.random.PRNGKey(0), depths=(1, 1), dims=(32, 64), num_classes=10
    )
    x = jnp.ones((1, 32, 32, 3))
    y = m(x)
    assert y.shape == (1, 10)
    names = engine.get_decomposeable_submodule_names(m)
    assert "stages.0.0.pwconv1" in names
    assert "stages.0.0.pwconv2" in names
    assert not any("dwconv" in n for n in names)  # grouped conv excluded


def test_vit_forward_and_sites():
    m = models.ViT.create(
        jax.random.PRNGKey(0), image_size=32, patch_size=8, dim=64,
        depth=2, n_heads=2, num_classes=10,
    )
    x = jnp.ones((2, 32, 32, 3))
    y = m(x)
    assert y.shape == (2, 10)
    names = engine.get_decomposeable_submodule_names(m)
    assert "blocks.0.attn.qkv" in names
    assert "blocks.1.mlp.fc2" in names


def test_lockd_wrap_resnet18_shape_preserved():
    m = models.resnet18(jax.random.PRNGKey(0), num_classes=10)
    wrapped = lockd.wrap(m, jax.random.PRNGKey(1))
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
    y0 = m(x)
    # train=False keeps BatchNorms on running stats (the reference trains the
    # gates with the teacher in eval mode, run_decompose_lockd.py:53); the
    # Gumbel gates still sample because a key is present.
    y1 = wrapped(x, ctx=nn.Ctx(key=jax.random.PRNGKey(3), train=False))
    assert y1.shape == y0.shape
    import numpy as np

    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)


def test_batchnorm_train_eval_and_updates():
    import numpy as np

    bn = nn.BatchNorm2d.create(4, stat_id=0)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 5, 5, 4)) * 3 + 1
    ctx = nn.Ctx(train=True)
    y_train = bn(x, ctx)
    # train mode normalizes with batch stats
    np.testing.assert_allclose(
        np.asarray(jnp.mean(y_train, axis=(0, 1, 2))), 0.0, atol=1e-4
    )
    assert "0" in ctx.sink["bn"]
    bn2 = nn.apply_bn_updates(bn, ctx.sink["bn"])
    # running stats moved toward batch stats (momentum 0.1)
    assert float(jnp.abs(bn2.running_mean - bn.running_mean).max()) > 0.01
    # eval mode uses running stats
    y_eval = bn2(x)
    assert y_eval.shape == x.shape
