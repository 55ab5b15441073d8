"""Full-rank exactness of the falor covariance path (mirrors
/root/reference/tests/test_deco_primitives_falor.py, which tests
use_mean=False, use_damping=True)."""

import jax
import jax.numpy as jnp

from ptdeco_tpu import engine, nn


class MyNetworkLinear(nn.Module):
    mod: nn.Linear

    def __call__(self, x, ctx=None):
        y = self.mod(x, ctx)
        return y.reshape(y.shape[0], -1)


def _data_iter(key, shape):
    while True:
        key, sub = jax.random.split(key)
        yield jax.random.uniform(sub, shape)


def _full_rank_roundtrip(use_mean: bool, use_damping: bool) -> float:
    dim_in, dim_out = 48, 24
    net = MyNetworkLinear(mod=nn.Linear.create(jax.random.PRNGKey(5), dim_in, dim_out))
    di = _data_iter(jax.random.PRNGKey(6), (8, 16, 16, dim_in))
    x = next(di)
    y0 = net(x)

    site = engine.get_site(net, "mod")
    kernel2d = engine.get_site_kernel2d(net, site)
    grams, means = engine.compute_output_grams(
        net, ["mod"], di, num_data_steps=8, accumulate_mean=use_mean
    )
    u = engine.eigenvectors_from_gram(
        grams["mod"],
        mean=means["mod"] if use_mean else None,
        use_damping=use_damping,
        in_float64=True,
    )
    k1, k2 = engine.build_factors(kernel2d, u, min(dim_in, dim_out))
    net2 = nn.replace_submodule(
        net, "mod", engine.build_decomposed_module(net, site, k1, k2)
    )
    y1 = net2(x)
    return float(jnp.max(jnp.abs(y0 - y1)))


def test_full_rank_exact_no_mean_damping():
    assert _full_rank_roundtrip(use_mean=False, use_damping=True) < 1e-6


def test_full_rank_exact_mean_damping():
    # eigenvectors of the centred covariance still span R^out at full rank
    assert _full_rank_roundtrip(use_mean=True, use_damping=True) < 1e-6
