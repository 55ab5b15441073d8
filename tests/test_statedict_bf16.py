"""bf16 state dicts must round-trip through the torch .pt format (torch
cannot ingest ml_dtypes bfloat16 numpy arrays directly — bitcast path)."""

import jax
import jax.numpy as jnp
import numpy as np

from ptdeco_tpu import nn, utils


class Net(nn.Module):
    fc: nn.Linear

    def __call__(self, x, ctx=None):
        return self.fc(x, ctx)


def test_bf16_pt_roundtrip(tmp_path):
    net = Net(fc=nn.Linear.create(jax.random.PRNGKey(0), 8, 4, dtype=jnp.bfloat16))
    sd = utils.state_dict(net)
    assert sd["fc.weight"].dtype == jnp.bfloat16
    p = str(tmp_path / "sd.pt")
    utils.save_state_dict_pt(sd, p)
    sd2 = utils.load_state_dict_pt(p)
    np.testing.assert_array_equal(
        np.asarray(sd["fc.weight"], np.float32),
        np.asarray(sd2["fc.weight"], np.float32),
    )
    net2 = utils.load_state_dict(
        Net(fc=nn.Linear.create(jax.random.PRNGKey(1), 8, 4, dtype=jnp.bfloat16)),
        sd2,
    )
    x = jnp.ones((2, 8), jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(net(x), np.float32), np.asarray(net2(x), np.float32)
    )


def test_bf16_safetensors_roundtrip(tmp_path):
    net = Net(fc=nn.Linear.create(jax.random.PRNGKey(0), 8, 4, dtype=jnp.bfloat16))
    sd = utils.state_dict(net)
    p = str(tmp_path / "sd.safetensors")
    utils.save_state_dict_safetensors(sd, p)
    sd2 = utils.load_state_dict_safetensors(p)
    np.testing.assert_array_equal(
        np.asarray(sd["fc.weight"], np.float32),
        np.asarray(sd2["fc.weight"], np.float32),
    )


def test_strict_load_flags_ignored_keys():
    """A key the importer would silently ignore (bias for a bias-less
    Linear) must fail strict load instead of being consumed and dropped."""
    import pytest

    m = nn.Linear.create(jax.random.PRNGKey(0), 4, 3, use_bias=False)
    sd = {
        "weight": np.zeros((3, 4), np.float32),
        "bias": np.zeros((3,), np.float32),
    }
    with pytest.raises(KeyError, match="Unexpected"):
        utils.load_state_dict(m, sd, strict=True)


def test_nonstrict_partial_load_keeps_present_keys():
    """strict=False with a missing bias must still load the present weight
    (torch partial-load semantics), not silently drop the whole module."""
    m = nn.Linear.create(jax.random.PRNGKey(0), 4, 3)
    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    m2 = utils.load_state_dict(m, {"weight": w}, strict=False)
    np.testing.assert_array_equal(np.asarray(m2.kernel), w.T)
    np.testing.assert_array_equal(np.asarray(m2.bias), np.asarray(m.bias))
