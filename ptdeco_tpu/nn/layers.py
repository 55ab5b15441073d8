"""Core layers (TPU-native layouts).

Layout conventions differ deliberately from the reference (torch):
  * ``Linear.kernel`` is ``(in_features, out_features)`` so ``y = x @ K`` —
    the natural MXU orientation.  Torch stores ``weight = K.T``; the
    transpose happens only at the torch-interop boundary
    (ptdeco_tpu/utils/statedict.py).
  * ``Conv2d`` is NHWC with an HWIO kernel (XLA/TPU native), vs torch NCHW +
    OIHW (reference works on NCHW throughout, e.g.
    /root/reference/src/ptdeco/dwain/decomposition.py:110-116).

Low-rank factor pairs therefore compose without transposes:
``y = (x @ K1) @ K2 + b`` where K1 = W^T u_k and K2 = u_k^T in reference
notation (dwain/decomposition.py:424-429).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Union

import jax
import jax.numpy as jnp

from .module import Ctx, Module, static_field

__all__ = [
    "Identity",
    "Linear",
    "Conv2d",
    "Sequential",
    "Activation",
    "LayerNorm",
    "RMSNorm",
    "BatchNorm2d",
    "Embedding",
    "Dropout",
    "apply_bn_updates",
    "max_pool2d",
    "linear_from_kernel",
    "conv1x1_from_kernel",
]


class Identity(Module):
    """Parameter-free pass-through (torch nn.Identity analogue) — used
    where an HF graph makes a norm slot conditional (e.g. ModernBERT
    decoder layer 0 has no attention norm) so the Block wiring stays
    uniform."""

    def __call__(self, x: jax.Array, ctx: Optional[Ctx] = None) -> jax.Array:
        return x


def _call_child(child: Module, x: jax.Array, ctx: Optional[Ctx]) -> jax.Array:
    return child(x, ctx=ctx)


class Linear(Module):
    kernel: jax.Array  # (in_features, out_features)
    bias: Optional[jax.Array]  # (out_features,) or None
    precision: Any = static_field(default=None)

    @property
    def in_features(self) -> int:
        return self.kernel.shape[0]

    @property
    def out_features(self) -> int:
        return self.kernel.shape[1]

    def __call__(self, x: jax.Array, ctx: Optional[Ctx] = None) -> jax.Array:
        y = jnp.dot(x, self.kernel, precision=self.precision)
        if self.bias is not None:
            y = y + self.bias
        return y

    @staticmethod
    def create(
        key: jax.Array,
        in_features: int,
        out_features: int,
        use_bias: bool = True,
        dtype: Any = jnp.float32,
        precision: Any = None,
    ) -> "Linear":
        kkey, bkey = jax.random.split(key)
        # torch.nn.Linear default init: kaiming_uniform(a=sqrt(5)) on W(out,in)
        # => U(-1/sqrt(fan_in), 1/sqrt(fan_in)) elementwise; same distribution
        # for our transposed layout.
        bound = 1.0 / math.sqrt(in_features)
        kernel = jax.random.uniform(
            kkey, (in_features, out_features), dtype, -bound, bound
        )
        bias = (
            jax.random.uniform(bkey, (out_features,), dtype, -bound, bound)
            if use_bias
            else None
        )
        return Linear(kernel=kernel, bias=bias, precision=precision)


def _pair(v: Union[int, Sequence[int]]) -> tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    t = tuple(v)
    assert len(t) == 2
    return (int(t[0]), int(t[1]))


class Conv2d(Module):
    """NHWC conv with HWIO kernel; mirrors torch.nn.Conv2d semantics.

    Static config mirrors the fields ptdeco serializes for Conv2d
    (/root/reference/src/ptdeco/utils/modconfig.py:29-41): kernel_size,
    groups, padding, padding_mode, stride, dilation, bias.
    """

    kernel: jax.Array  # (kh, kw, in_ch // groups, out_ch)
    bias: Optional[jax.Array]
    stride: tuple[int, int] = static_field(default=(1, 1))
    padding: Any = static_field(default=(0, 0))  # int pair or "same"/"valid"
    dilation: tuple[int, int] = static_field(default=(1, 1))
    groups: int = static_field(default=1)
    padding_mode: str = static_field(default="zeros")
    precision: Any = static_field(default=None)

    @property
    def kernel_size(self) -> tuple[int, int]:
        return (self.kernel.shape[0], self.kernel.shape[1])

    @property
    def in_channels(self) -> int:
        return self.kernel.shape[2] * self.groups

    @property
    def out_channels(self) -> int:
        return self.kernel.shape[3]

    def __call__(self, x: jax.Array, ctx: Optional[Ctx] = None) -> jax.Array:
        if self.padding_mode != "zeros":
            raise NotImplementedError(f"padding_mode={self.padding_mode}")
        if isinstance(self.padding, str):
            padding: Any = self.padding.upper()
        else:
            ph, pw = _pair(self.padding)
            padding = [(ph, ph), (pw, pw)]
        y = jax.lax.conv_general_dilated(
            x,
            self.kernel,
            window_strides=self.stride,
            padding=padding,
            rhs_dilation=self.dilation,
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=self.precision,
        )
        if self.bias is not None:
            y = y + self.bias
        return y

    @staticmethod
    def create(
        key: jax.Array,
        in_channels: int,
        out_channels: int,
        kernel_size: Union[int, tuple[int, int]],
        stride: Union[int, tuple[int, int]] = 1,
        padding: Any = 0,
        dilation: Union[int, tuple[int, int]] = 1,
        groups: int = 1,
        use_bias: bool = True,
        dtype: Any = jnp.float32,
        precision: Any = None,
    ) -> "Conv2d":
        kh, kw = _pair(kernel_size)
        kkey, bkey = jax.random.split(key)
        fan_in = in_channels // groups * kh * kw
        bound = 1.0 / math.sqrt(fan_in)
        kernel = jax.random.uniform(
            kkey, (kh, kw, in_channels // groups, out_channels), dtype, -bound, bound
        )
        bias = (
            jax.random.uniform(bkey, (out_channels,), dtype, -bound, bound)
            if use_bias
            else None
        )
        pad = padding if isinstance(padding, str) else _pair(padding)
        return Conv2d(
            kernel=kernel,
            bias=bias,
            stride=_pair(stride),
            padding=pad,
            dilation=_pair(dilation),
            groups=groups,
            precision=precision,
        )


class Sequential(Module):
    """Container whose children are named "0", "1", ... (torch convention).

    Decomposed factor pairs are ``Sequential(lin1, lin2)`` so their parameter
    names round-trip with reference checkpoints:
    ``{site}.0.weight`` / ``{site}.1.weight`` / ``{site}.1.bias``
    (see /root/reference/src/ptdeco/dwain/decomposition.py:69-86).
    """

    layers: tuple

    def _name_children(self):
        for i, m in enumerate(self.layers):
            yield str(i), m

    def __call__(self, x: jax.Array, ctx: Optional[Ctx] = None) -> jax.Array:
        for m in self.layers:
            x = _call_child(m, x, ctx)
        return x

    def __getitem__(self, i: int) -> Module:
        return self.layers[i]

    def __len__(self) -> int:
        return len(self.layers)

    @property
    def in_features(self) -> int:
        return self.layers[0].in_features

    @property
    def out_features(self) -> int:
        return self.layers[-1].out_features


class Activation(Module):
    """Named activation as a module (for Sequential-style model defs).

    ``gelu`` maps to the exact erf form — torch's ``nn.GELU`` default —
    NOT jax.nn.gelu's tanh approximation, so torch-parity model ports
    composed from this module keep decision-parity numerics."""

    name: str = static_field(default="relu")

    def __call__(self, x: jax.Array, ctx: Optional[Ctx] = None) -> jax.Array:
        if self.name == "gelu":
            return jax.nn.gelu(x, approximate=False)
        return getattr(jax.nn, self.name)(x)


class LayerNorm(Module):
    # scale is None for the non-parametric flavor (olmo's OlmoLayerNorm:
    # no learnable affine at all); plus_one is nemotron's LayerNorm1P
    # (y * (weight + 1) + bias, weight zero-initialized; the stored/
    # exported weight stays the raw HF value)
    scale: Optional[jax.Array]
    offset: Optional[jax.Array]
    eps: float = static_field(default=1e-5)
    plus_one: bool = static_field(default=False)

    def __call__(self, x: jax.Array, ctx: Optional[Ctx] = None) -> jax.Array:
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.scale is not None:
            w = self.scale.astype(jnp.float32)
            y = y * (w + 1.0) if self.plus_one else y * w
        if self.offset is not None:
            y = y + self.offset.astype(jnp.float32)
        return y.astype(dtype)

    @staticmethod
    def create(dim: int, use_bias: bool = True, eps: float = 1e-5,
               dtype: Any = jnp.float32, plus_one: bool = False,
               affine: bool = True) -> "LayerNorm":
        init = jnp.zeros if plus_one else jnp.ones
        return LayerNorm(
            scale=init((dim,), dtype) if affine else None,
            offset=jnp.zeros((dim,), dtype) if use_bias and affine else None,
            eps=eps,
            plus_one=plus_one,
        )


class RMSNorm(Module):
    scale: jax.Array
    eps: float = static_field(default=1e-6)
    # gemma convention: y * (1 + weight), weight zero-initialized (HF
    # GemmaRMSNorm); the stored/exported weight stays the raw HF value
    plus_one: bool = static_field(default=False)

    def __call__(self, x: jax.Array, ctx: Optional[Ctx] = None) -> jax.Array:
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.eps)
        w = self.scale.astype(jnp.float32)
        if self.plus_one:
            w = w + 1.0
        return (y * w).astype(dtype)

    @staticmethod
    def create(
        dim: int,
        eps: float = 1e-6,
        dtype: Any = jnp.float32,
        plus_one: bool = False,
    ) -> "RMSNorm":
        init = jnp.zeros if plus_one else jnp.ones
        return RMSNorm(scale=init((dim,), dtype), eps=eps, plus_one=plus_one)


class Embedding(Module):
    table: jax.Array  # (vocab, dim)

    def __call__(self, ids: jax.Array, ctx: Optional[Ctx] = None) -> jax.Array:
        return jnp.take(self.table, ids, axis=0)

    @staticmethod
    def create(key: jax.Array, vocab: int, dim: int,
               dtype: Any = jnp.float32) -> "Embedding":
        return Embedding(table=jax.random.normal(key, (vocab, dim), dtype) * 0.02)


class Dropout(Module):
    rate: float = static_field(default=0.0)
    rng_id: int = static_field(default=0)

    def __call__(self, x: jax.Array, ctx: Optional[Ctx] = None) -> jax.Array:
        if ctx is None or not ctx.train or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        mask = jax.random.bernoulli(ctx.rng(self.rng_id), keep, x.shape)
        return jnp.where(mask, x / keep, 0.0)


class BatchNorm2d(Module):
    """NHWC batch norm with running statistics.

    Eval mode normalizes with the stored running stats.  In train mode
    (ctx.train) it normalizes with batch statistics and *sows* the updated
    running stats into ``ctx.sink["bn"]`` under this layer's ``stat_id`` —
    the functional replacement for torch's in-module mutation; training
    loops apply the sown stats back with ``apply_bn_updates``.
    """

    scale: jax.Array
    offset: jax.Array
    running_mean: jax.Array
    running_var: jax.Array
    eps: float = static_field(default=1e-5)
    momentum: float = static_field(default=0.1)
    stat_id: int = static_field(default=-1)

    def __call__(self, x: jax.Array, ctx: Optional[Ctx] = None) -> jax.Array:
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        if ctx is not None and ctx.train:
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.var(xf, axis=(0, 1, 2))
            if self.stat_id >= 0:
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * n / max(n - 1, 1)
                new_mean = (
                    (1 - self.momentum) * self.running_mean + self.momentum * mean
                )
                new_var = (
                    (1 - self.momentum) * self.running_var + self.momentum * unbiased
                )
                ctx.sow(str(self.stat_id), "bn", (new_mean, new_var))
        else:
            mean = self.running_mean
            var = self.running_var
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * self.scale + self.offset).astype(dtype)

    @staticmethod
    def create(dim: int, eps: float = 1e-5, momentum: float = 0.1,
               stat_id: int = -1) -> "BatchNorm2d":
        return BatchNorm2d(
            scale=jnp.ones((dim,), jnp.float32),
            offset=jnp.zeros((dim,), jnp.float32),
            running_mean=jnp.zeros((dim,), jnp.float32),
            running_var=jnp.ones((dim,), jnp.float32),
            eps=eps,
            momentum=momentum,
            stat_id=stat_id,
        )


def apply_bn_updates(root: Module, bn_sink: dict) -> Module:
    """Write sown (mean, var) running stats back into the tree."""
    from .module import named_modules, replace_submodule

    for name, m in list(named_modules(root)):
        if isinstance(m, BatchNorm2d) and str(m.stat_id) in bn_sink:
            mean, var = bn_sink[str(m.stat_id)]
            root = replace_submodule(
                root, name, m.replace(running_mean=mean, running_var=var)
            )
    return root


def max_pool2d(
    x: jax.Array,
    window: int,
    stride: int,
    padding: int = 0,
) -> jax.Array:
    """NHWC max pool (torch MaxPool2d semantics with symmetric padding)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def linear_from_kernel(
    kernel: jax.Array, bias: Optional[jax.Array] = None, precision: Any = None
) -> Linear:
    return Linear(kernel=kernel, bias=bias, precision=precision)


def conv1x1_from_kernel(
    kernel2d: jax.Array,  # (in, out)
    bias: Optional[jax.Array] = None,
    precision: Any = None,
) -> Conv2d:
    """Build a 1x1 NHWC conv from an (in, out) matrix."""
    return Conv2d(
        kernel=kernel2d[None, None, :, :],
        bias=bias,
        stride=(1, 1),
        padding=(0, 0),
        dilation=(1, 1),
        groups=1,
        precision=precision,
    )
