"""Torch-paired goldens for the vision zoo's hardest blocks (VERDICT r2
item 8): the native SwinV2 block (shifted window attention), the
EfficientFormerV2 Attention4D mixer, and the ConvNeXt block are loaded with
IDENTICAL weights into canonical-upstream pure-torch mirrors
(aux/torch_block_mirrors.py) and must produce matching outputs — so a
silent porting bug can no longer hide behind self-paired tests, and real
pretrained checkpoint imports can't be silently wrong."""

import importlib.util
import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ptdeco_tpu import nn, utils
from ptdeco_tpu.models import convnext, efficientformer, swin

torch.set_num_threads(1)

_MIRRORS = pathlib.Path(__file__).parent.parent / "aux" / "torch_block_mirrors.py"


def _mirrors():
    spec = importlib.util.spec_from_file_location("torch_block_mirrors", _MIRRORS)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _randomize(model, seed):
    """Non-degenerate values for every param/buffer (BN stats included)."""
    rng = np.random.RandomState(seed)
    for name, leaf in list(nn.named_parameters(model)):
        v = rng.randn(*leaf.shape).astype(np.float32) * 0.1
        if name.endswith("running_var"):
            v = np.abs(v) + 0.5
        if name.endswith("logit_scale"):
            v = np.log(np.abs(v) * 20 + 2.0)
        model = nn.replace_submodule(model, name, jnp.asarray(v, leaf.dtype))
    return model


def _load_mirror(tm, native):
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in utils.state_dict(native).items()}
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    # buffers we don't export (constant index tables) may be "missing";
    # nothing unexpected may remain
    assert not unexpected, unexpected
    assert all(
        m.endswith(("rel_coords", "rel_index", "bias_idx", "attn_mask"))
        or "num_batches_tracked" in m
        for m in missing
    ), missing
    return tm.eval()


def test_convnext_block_matches_upstream_torch():
    m = _mirrors()
    dim = 24
    native = convnext.ConvNeXtBlock.create(jax.random.PRNGKey(0), dim)
    native = _randomize(native, 0)
    tm = _load_mirror(m.TorchConvNeXtBlock(dim), native)

    x = np.random.RandomState(1).randn(2, 12, 12, dim).astype(np.float32)
    y = np.asarray(native(jnp.asarray(x)))
    with torch.no_grad():
        y_ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(y, y_ref.transpose(0, 2, 3, 1), atol=1e-5)


@pytest.mark.parametrize("shift", [0, 2])
def test_swinv2_block_matches_upstream_torch(shift):
    m = _mirrors()
    dim, heads, window, res = 16, 4, 4, (8, 8)
    native = swin.SwinBlock.create(
        jax.random.PRNGKey(0), dim, heads, res, window, shift
    )
    native = _randomize(native, 2)
    # upstream SwinV2 pins the k-bias segment to zero (stored as separate
    # q_bias/v_bias); zero it on the native side so both match the
    # convention
    qkv_bias = np.asarray(native.attn.qkv.bias).copy()
    qkv_bias[dim : 2 * dim] = 0.0
    native = nn.replace_submodule(native, "attn.qkv.bias", jnp.asarray(qkv_bias))

    tm = _load_mirror(
        m.TorchSwinV2Block(dim, heads, res, window, shift), native
    )

    x = np.random.RandomState(3).randn(2, res[0] * res[1], dim).astype(np.float32)
    y = np.asarray(native(jnp.asarray(x)))
    with torch.no_grad():
        y_ref = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(y, y_ref, atol=2e-5)


@pytest.mark.parametrize("shift,extra_norm", [(0, False), (2, True)])
def test_swinv2_cr_block_matches_upstream_torch(shift, extra_norm):
    """The _cr family (VERDICT r4 #6): clamped-scale cosine attention +
    meta-MLP all-pairs position bias (WITH out-bias, no sigmoid squash) +
    post-norm wiring + optional extra stage norm, against a pure-torch
    mirror of timm's swin_transformer_v2_cr semantics."""
    m = _mirrors()
    dim, heads, window, res = 16, 4, 4, (8, 8)
    native = swin.SwinBlock.create(
        jax.random.PRNGKey(0), dim, heads, res, window, shift,
        cr=True, extra_norm=extra_norm,
    )
    native = _randomize(native, 6)
    tm = _load_mirror(
        m.TorchSwinV2CrBlock(
            dim, heads, res, window, shift, extra_norm=extra_norm
        ),
        native,
    )

    x = np.random.RandomState(7).randn(2, res[0] * res[1], dim).astype(np.float32)
    y = np.asarray(native(jnp.asarray(x)))
    with torch.no_grad():
        y_ref = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(y, y_ref, atol=2e-5)


def test_attention4d_matches_upstream_torch():
    m = _mirrors()
    dim, res = 32, 6
    sid = [0]
    native = efficientformer.Attention4D.create(
        jax.random.PRNGKey(0), dim, res, sid, n_heads=4, key_dim=8,
        attn_ratio=2,
    )
    native = _randomize(native, 4)
    tm = _load_mirror(
        m.TorchAttention4D(dim, res, n_heads=4, key_dim=8, attn_ratio=2),
        native,
    )

    x = np.random.RandomState(5).randn(2, res, res, dim).astype(np.float32)
    y = np.asarray(native(jnp.asarray(x)))
    with torch.no_grad():
        y_ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(y, y_ref.transpose(0, 2, 3, 1), atol=2e-5)
