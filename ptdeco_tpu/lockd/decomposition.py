"""LOCKD — LOCal Knowledge Distillation decomposition (TPU-native).

Functional re-implementation of
/root/reference/src/ptdeco/lockd/decomposition.py: every Linear / groups==1
Conv2d is shadowed by a trainable two-factor student with Gumbel-sigmoid
channel gates; after a short distillation training run, channels whose gate
logits are positive are kept and the student factor pair replaces the
original layer.

TPU-native re-design of the torch mechanisms:
  * wrapped layers are pytree modules; wrapping/pruning are pure functions
    ``Module -> Module``;
  * Gumbel sampling uses explicit keys folded per layer from the step key
    threaded through ``nn.Ctx`` (reference relies on torch's global RNG,
    lockd:47-54);
  * per-layer NSRs are *sown* into the Ctx sink during the forward and
    consumed by the loss functions (the reference scans module attributes
    set as a forward side effect, lockd:126-135 + losses.py) — this keeps
    the whole training step one pure jitted function.
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import nn, utils

__all__ = [
    "sample_from_logits",
    "WrappedLOCKDLinear",
    "WrappedLOCKDConv2d",
    "wrap",
    "decompose",
    "calc_propotion_from_logits",
    "is_wrapped_module",
    "trainable_partition",
    "named_wrapped_modules",
]

logger = logging.getLogger(__name__)

GUMBEL_TAU = 0.5  # reference lockd:50


def sample_from_logits(logits: jax.Array, key: jax.Array) -> jax.Array:
    """Relaxed 2-class Gumbel-softmax gate, zeroed where logits < 0
    (reference lockd:47-54).  For classes [logit, 0] the softmax reduces to
    ``sigmoid((logit + g0 - g1) / tau)``."""
    g = jax.random.gumbel(key, (2,) + logits.shape, dtype=jnp.float32)
    gs = jax.nn.sigmoid((logits.astype(jnp.float32) + g[0] - g[1]) / GUMBEL_TAU)
    return jnp.where(logits < 0.0, 0.0, gs).astype(logits.dtype)


def expected_gate(logits: jax.Array) -> jax.Array:
    """Deterministic (eval-mode) gate: the zero-noise relaxation."""
    gs = jax.nn.sigmoid(logits.astype(jnp.float32) / GUMBEL_TAU)
    return jnp.where(logits < 0.0, 0.0, gs).astype(logits.dtype)


def calc_propotion_from_logits(logits: jax.Array) -> jax.Array:
    # (sic) name kept for parity with the reference export, lockd:291-292
    return jnp.mean(jax.nn.sigmoid(logits))


def _gate(logits: jax.Array, ctx: Optional[nn.Ctx], rng_id: int) -> jax.Array:
    if ctx is not None and ctx.key is not None:
        return sample_from_logits(logits, ctx.rng(rng_id))
    return expected_gate(logits)


class WrappedLOCKDLinear(nn.Module):
    """Teacher Linear + gated two-factor student (reference lockd:191-285).

    Forward returns the *teacher* output so downstream layers see original
    activations; the student NSR is sown into the ctx sink under this
    layer's name."""

    lin_orig: nn.Linear
    lin_0: nn.Linear  # in -> hidden, no bias
    lin_1: nn.Linear  # hidden -> out, bias iff orig has bias
    logits: jax.Array  # (hidden,)
    name: str = nn.static_field(default="")
    rng_id: int = nn.static_field(default=0)

    @property
    def hidden_features(self) -> int:
        return self.logits.shape[0]

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        y_orig = self.lin_orig(x)
        hidden = self.lin_0(x)
        mask = _gate(self.logits, ctx, self.rng_id)
        # match the activation dtype: the f32 gate would otherwise promote
        # bf16 hidden to f32 and break mixed-precision compute
        y_deco = self.lin_1(mask.astype(hidden.dtype) * hidden)
        if x.ndim == 2:
            non_channel_dim: tuple[int, ...] = (0,)
        elif x.ndim == 3:
            non_channel_dim = (0, 1)
        elif x.ndim == 4:
            non_channel_dim = (0, 1, 2)
        else:
            raise NotImplementedError(f"WrappedLinear: {x.shape=}")
        nsr = utils.calc_per_channel_noise_to_signal_ratio(
            y=y_orig, x=y_deco, non_channel_dim=non_channel_dim
        )
        if ctx is not None:
            ctx.sow(self.name, "nsr", nsr)
        return y_orig

    @classmethod
    def create(
        cls, key: jax.Array, module_orig: nn.Linear, name: str, rng_id: int
    ) -> "WrappedLOCKDLinear":
        in_f, out_f = module_orig.in_features, module_orig.out_features
        hidden = min(in_f, out_f)
        k0, k1 = jax.random.split(key)
        dtype = module_orig.kernel.dtype
        lin_0 = nn.Linear.create(k0, in_f, hidden, use_bias=False, dtype=dtype)
        lin_1 = nn.Linear.create(
            k1, hidden, out_f, use_bias=module_orig.bias is not None, dtype=dtype
        )
        # gates start open at logit 3.0 (reference lockd:218-220)
        logits = 3.0 * jnp.ones((hidden,), jnp.float32)
        return cls(
            lin_orig=module_orig,
            lin_0=lin_0,
            lin_1=lin_1,
            logits=logits,
            name=name,
            rng_id=rng_id,
        )

    def get_decomposed_module_and_meta(self) -> tuple[nn.Module, dict[str, Any]]:
        logits = np.asarray(jax.device_get(self.logits))
        indices = np.where(logits > 0)[0]
        if len(indices) == 0:
            # keep the strongest channel — a zero-width factor pair would
            # reduce the layer to bias-only output.  The reference guards
            # only its conv path this way (lockd:152-154); its Linear path
            # has the same gap, fixed here for both.
            indices = np.where(logits >= logits.max())[0]
        c1, c0 = len(indices), len(logits)
        p = c1 / c0
        logger.info(
            f"Leaving {c1} out of {c0} intermediate channels ({p*100.0:4.1f} %)"
        )
        k0 = jnp.take(self.lin_0.kernel, jnp.asarray(indices), axis=1)
        k1 = jnp.take(self.lin_1.kernel, jnp.asarray(indices), axis=0)
        new = nn.Sequential(
            layers=(
                self.lin_0.replace(kernel=k0),
                self.lin_1.replace(kernel=k1),
            )
        )
        return new, {"proportion": p}

    def get_orig_module(self) -> nn.Module:
        return self.lin_orig


class WrappedLOCKDConv2d(nn.Module):
    """Teacher Conv2d + gated student = 1x1 conv -> mask -> kxk conv
    (reference WrappedLOCKConv2d, lockd:83-188).  NHWC: the (mid,) mask
    broadcasts over the channel (last) axis directly."""

    conv_orig: nn.Conv2d
    conv_1: nn.Conv2d  # 1x1, in -> mid, no bias
    conv_2: nn.Conv2d  # kxk, mid -> out, stride/padding of orig
    logits: jax.Array  # (mid,)
    name: str = nn.static_field(default="")
    rng_id: int = nn.static_field(default=0)

    @property
    def middle_features(self) -> int:
        return self.logits.shape[0]

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        y0 = self.conv_orig(x)
        mask = _gate(self.logits, ctx, self.rng_id)
        z = self.conv_1(x)
        z = mask.astype(z.dtype) * z  # NHWC: broadcasts over channels
        z = self.conv_2(z)
        nsr = utils.calc_per_channel_noise_to_signal_ratio(
            y=y0, x=z, non_channel_dim=(0, 1, 2)
        )
        if ctx is not None:
            ctx.sow(self.name, "nsr", nsr)
        return y0

    @classmethod
    def create(
        cls, key: jax.Array, module_orig: nn.Conv2d, name: str, rng_id: int
    ) -> "WrappedLOCKDConv2d":
        if module_orig.groups != 1:
            raise ValueError("LOCKD wraps only groups==1 convolutions")
        in_f = module_orig.in_channels
        out_f = module_orig.out_channels
        mid = min(in_f, out_f)
        k1, k2 = jax.random.split(key)
        dtype = module_orig.kernel.dtype
        conv_1 = nn.Conv2d.create(
            k1, in_f, mid, kernel_size=1, use_bias=False, dtype=dtype
        )
        conv_2 = nn.Conv2d.create(
            k2,
            mid,
            out_f,
            kernel_size=module_orig.kernel_size,
            stride=module_orig.stride,
            padding=module_orig.padding,
            dilation=module_orig.dilation,
            use_bias=module_orig.bias is not None,
            dtype=dtype,
        )
        logits = 3.0 * jnp.ones((mid,), jnp.float32)
        return cls(
            conv_orig=module_orig,
            conv_1=conv_1,
            conv_2=conv_2,
            logits=logits,
            name=name,
            rng_id=rng_id,
        )

    def get_decomposed_module_and_meta(self) -> tuple[nn.Module, dict[str, Any]]:
        logits = np.asarray(jax.device_get(self.logits))
        indices = np.where(logits > 0)[0]
        if len(indices) == 0:
            # keep the strongest channel (reference lockd:152-154)
            indices = np.where(logits >= logits.max())[0]
        c1, c0 = len(indices), len(logits)
        p = c1 / c0
        logger.info(
            f"Leaving {c1} out of {c0} intermediate channels ({p*100.0:4.1f} %)"
        )
        idx = jnp.asarray(indices)
        k1 = jnp.take(self.conv_1.kernel, idx, axis=3)  # HWIO: out axis
        k2 = jnp.take(self.conv_2.kernel, idx, axis=2)  # HWIO: in axis
        new = nn.Sequential(
            layers=(
                self.conv_1.replace(kernel=k1),
                self.conv_2.replace(kernel=k2),
            )
        )
        return new, {"proportion": p}

    def get_orig_module(self) -> nn.Module:
        return self.conv_orig


_WRAPPED_TYPES = (WrappedLOCKDLinear, WrappedLOCKDConv2d)


def is_wrapped_module(m: Any) -> bool:
    if isinstance(m, _WRAPPED_TYPES):
        return True
    if isinstance(m, nn.Module):
        return any(isinstance(sub, _WRAPPED_TYPES) for _, sub in nn.named_modules(m))
    return False


def named_wrapped_modules(root: nn.Module):
    for name, m in nn.named_modules(root):
        if isinstance(m, _WRAPPED_TYPES):
            yield name, m


def _wrappable(m: Any) -> bool:
    if isinstance(m, nn.Linear):
        return True
    if isinstance(m, nn.Conv2d) and m.groups == 1:
        # reference silently skips grouped convs (lockd:338-342)
        return True
    return False


def wrap(
    module: nn.Module,
    key: jax.Array,
    blacklisted_module_names: Optional[list[str]] = None,
) -> nn.Module:
    """Wrap every Linear / groups==1 Conv2d child with a gated student
    (functional analogue of reference ``wrap_in_place``, lockd:304-377).
    Returns a new model; the original is untouched."""
    blacklist = set(blacklisted_module_names or [])
    targets: list[tuple[str, nn.Module]] = []
    for name, m in nn.named_modules(module):
        if name == "":
            continue
        if isinstance(m, _WRAPPED_TYPES):
            raise ValueError(f"Model already wrapped at {name}")
        if _wrappable(m):
            if name in blacklist:
                logger.info(f"Blacklisted - not wrapping {name}")
                continue
            targets.append((name, m))

    counter: dict[str, int] = {}
    for rng_id, (name, m) in enumerate(targets):
        subkey = jax.random.fold_in(key, rng_id)
        if isinstance(m, nn.Linear):
            new: nn.Module = WrappedLOCKDLinear.create(subkey, m, name, rng_id)
        else:
            new = WrappedLOCKDConv2d.create(subkey, m, name, rng_id)
        module = nn.replace_submodule(module, name, new)
        tname = utils.get_type_name(m)
        counter[tname] = counter.get(tname, 0) + 1
    for tname, count in counter.items():
        logger.info(f"Wrapped {count} instances of {tname}")
    return module


def decompose(
    module: nn.Module,
    proportion_threshold: float,
    blacklisted_module_names: Optional[list[str]] = None,
) -> tuple[nn.Module, dict[str, Any]]:
    """Prune gated channels and swap in the student factor pairs
    (functional analogue of reference ``decompose_in_place``,
    lockd:398-459): a wrapped layer is decomposed iff its mean gate
    probability is below ``proportion_threshold`` and it is not
    blacklisted; otherwise the original layer is restored.
    Returns ``(new_module, decompose_config)``."""
    blacklist = set(blacklisted_module_names or [])
    decompose_config: dict[str, Any] = {}
    counter: dict[str, int] = {}

    for name, m in list(named_wrapped_modules(module)):
        p = float(calc_propotion_from_logits(m.logits))
        tname = utils.get_type_name(m)
        blacklisted = name in blacklist
        if not blacklisted and p < proportion_threshold:
            logger.info(f"Decomposing {name} [{tname}], proportion={p:.3f}")
            new_module, meta = m.get_decomposed_module_and_meta()
            module = nn.replace_submodule(module, name, new_module)
            counter[tname] = counter.get(tname, 0) + 1
            module_config = utils.get_module_config(new_module)
            module_config[utils.MODCONFIG_META_KEY] = meta
            decompose_config[name] = module_config
        else:
            module = nn.replace_submodule(module, name, m.get_orig_module())
            reason = "blacklisted" if blacklisted else "proportion too high"
            logger.info(f"Reverting to orig module, {reason} - {name} p={p:.3f}")

    for tname, count in counter.items():
        logger.info(f"Decomposed {count} instances of {tname}")
    return module, decompose_config


def trainable_partition(root: nn.Module) -> tuple[nn.Module, nn.Module]:
    """Split the model into (trainable, frozen) trees: student factors and
    gate logits train; everything else (incl. the teachers) is frozen
    (reference get_parameters_trainable, lockd:462-473).  Recombine with
    ``nn.combine``."""
    trainable_names: list[str] = []
    for name, m in named_wrapped_modules(root):
        if isinstance(m, WrappedLOCKDLinear):
            trainable_names += [f"{name}.lin_0", f"{name}.lin_1", f"{name}.logits"]
        else:
            trainable_names += [f"{name}.conv_1", f"{name}.conv_2", f"{name}.logits"]
    paths = nn.tree_paths_of(root, trainable_names)

    def predicate(path, leaf):
        return jax.tree_util.keystr(path) in paths

    return nn.partition(root, predicate)
