"""Import weights from a real flax.linen model into a native twin."""

import flax.linen as fnn
import jax
import numpy as np

from ptdeco_tpu import nn
from ptdeco_tpu.models.flax_interop import load_flax_params


class FlaxMLP(fnn.Module):
    @fnn.compact
    def __call__(self, x):
        x = fnn.Dense(16, name="fc1")(x)
        x = fnn.relu(x)
        x = fnn.LayerNorm(name="ln")(x)
        return fnn.Dense(4, name="fc2")(x)


class NativeMLP(nn.Module):
    fc1: nn.Linear
    ln: nn.LayerNorm
    fc2: nn.Linear

    def __call__(self, x, ctx=None):
        return self.fc2(self.ln(jax.nn.relu(self.fc1(x, ctx)), ctx), ctx)


def test_load_flax_params_matches_linen_apply():
    fm = FlaxMLP()
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 8))
    variables = fm.init(jax.random.PRNGKey(1), x)
    y_flax = fm.apply(variables, x)

    k = jax.random.split(jax.random.PRNGKey(2), 2)
    native = NativeMLP(
        fc1=nn.Linear.create(k[0], 8, 16),
        ln=nn.LayerNorm.create(16, eps=1e-6),
        fc2=nn.Linear.create(k[1], 16, 4),
    )
    native = load_flax_params(native, variables)
    y_native = native(x)
    np.testing.assert_allclose(
        np.asarray(y_native), np.asarray(y_flax), atol=1e-5
    )
