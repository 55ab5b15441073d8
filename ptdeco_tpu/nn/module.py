"""Pytree-native module system.

This is the substrate that replaces ``torch.nn.Module`` in the reference
(ptdeco operates by in-place submodule surgery, see
/root/reference/src/ptdeco/utils/common.py:88-93).  Here a module *is* a JAX
pytree: parameters are leaves, submodules are subtrees, and configuration is
static (hashable) auxiliary data.  "Surgery" therefore becomes a pure function
``replace_submodule(root, name, new) -> new_root`` that is safe to perform
inside a ``jax.jit`` trace, and a whole model can be passed directly as an
argument to jitted functions.

Design notes (TPU-first):
  * No mutation anywhere: decomposition transforms are ``Module -> Module``.
  * Static fields must be declared with ``static_field()``; everything else is
    pytree-dynamic (arrays, submodules, or nested containers thereof).
  * Torch-style dotted names ("blocks.0.attn.qkv") are derived from field
    names; ``Sequential`` elides its container field so decomposed factor
    pairs get names ``{site}.0`` / ``{site}.1`` exactly like the reference
    (ptdeco builds ``torch.nn.Sequential(lin_1, lin_2)``, see
    /root/reference/src/ptdeco/dwain/decomposition.py:69-86).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Iterator, Optional, TypeVar

import jax
import jax.numpy as jnp

__all__ = [
    "Module",
    "static_field",
    "field",
    "named_modules",
    "named_parameters",
    "get_submodule",
    "replace_submodule",
    "replace_submodules",
    "update_leaf",
    "get_leaf",
    "partition",
    "buffer_leaf_ids",
    "trainable_predicate",
    "combine",
    "tree_paths_of",
    "Ctx",
]

T = TypeVar("T", bound="Module")

_STATIC_MARK = "ptdeco_tpu_static"


def static_field(**kwargs: Any) -> Any:
    """Declare a dataclass field as static (hashable aux data, not a leaf)."""
    metadata = dict(kwargs.pop("metadata", {}))
    metadata[_STATIC_MARK] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def field(**kwargs: Any) -> Any:
    """Declare a regular (dynamic) dataclass field."""
    return dataclasses.field(**kwargs)


def _is_static(f: dataclasses.Field) -> bool:
    return bool(f.metadata.get(_STATIC_MARK, False))


class Module:
    """Base class: immutable dataclass registered as a JAX pytree."""

    def __init_subclass__(cls, **kwargs: Any) -> None:
        super().__init_subclass__(**kwargs)
        dataclasses.dataclass(frozen=True, eq=False, repr=False)(cls)
        dyn = [f.name for f in dataclasses.fields(cls) if not _is_static(f)]
        sta = [f.name for f in dataclasses.fields(cls) if _is_static(f)]
        cls._dynamic_fields = tuple(dyn)
        cls._static_fields = tuple(sta)

        def flatten_with_keys(obj: Module):
            children = [
                (jax.tree_util.GetAttrKey(name), getattr(obj, name)) for name in dyn
            ]
            aux = tuple(getattr(obj, name) for name in sta)
            return children, aux

        def flatten(obj: Module):
            children = tuple(getattr(obj, name) for name in dyn)
            aux = tuple(getattr(obj, name) for name in sta)
            return children, aux

        def unflatten(aux: tuple, children: tuple) -> Module:
            obj = object.__new__(cls)
            for name, value in zip(dyn, children):
                object.__setattr__(obj, name, value)
            for name, value in zip(sta, aux):
                object.__setattr__(obj, name, value)
            return obj

        jax.tree_util.register_pytree_with_keys(
            cls, flatten_with_keys, unflatten, flatten_func=flatten
        )

    # -- niceties ---------------------------------------------------------
    def __repr__(self) -> str:
        parts = []
        for f in dataclasses.fields(self):  # type: ignore[arg-type]
            v = getattr(self, f.name)
            if isinstance(v, (jnp.ndarray, jax.Array)):
                parts.append(f"{f.name}=Array{tuple(v.shape)}:{v.dtype}")
            else:
                parts.append(f"{f.name}={v!r}")
        return f"{type(self).__name__}({', '.join(parts)})"

    def replace(self: T, **changes: Any) -> T:
        return dataclasses.replace(self, **changes)  # type: ignore[type-var]

    # -- traversal hooks ---------------------------------------------------
    def _name_children(self) -> Iterator[tuple[str, Any]]:
        """Yield (name, value) for dynamic fields, expanding containers.

        ``Sequential`` overrides this to elide the container field name so
        children are named "0", "1", ... (torch convention).
        """
        for fname in type(self)._dynamic_fields:
            value = getattr(self, fname)
            yield from _expand(fname, value)


def _expand(prefix: str, value: Any) -> Iterator[tuple[str, Any]]:
    if isinstance(value, (list, tuple)):
        for i, v in enumerate(value):
            yield from _expand(f"{prefix}.{i}", v)
    elif isinstance(value, dict):
        for k, v in value.items():
            yield from _expand(f"{prefix}.{k}", v)
    else:
        yield prefix, value


def named_modules(
    root: Module, prefix: str = ""
) -> Iterator[tuple[str, Module]]:
    """Yield (dotted_name, module) pairs, root first — mirrors
    ``torch.nn.Module.named_modules`` which ptdeco uses for layer discovery
    (/root/reference/src/ptdeco/dwain/decomposition.py:549-559)."""
    yield prefix, root
    for name, child in root._name_children():
        if isinstance(child, Module):
            full = f"{prefix}.{name}" if prefix else name
            yield from named_modules(child, full)


def named_parameters(
    root: Module, prefix: str = ""
) -> Iterator[tuple[str, jax.Array]]:
    """Yield (dotted_name, array) for every array leaf."""
    for name, child in root._name_children():
        full = f"{prefix}.{name}" if prefix else name
        if isinstance(child, Module):
            yield from named_parameters(child, full)
        elif isinstance(child, (jax.Array, jnp.ndarray)) or hasattr(child, "shape"):
            yield full, child
        elif child is None:
            continue


def _resolve(root: Module, name: str) -> list[tuple[Any, str]]:
    """Resolve a dotted name into a chain of (container, key) hops.

    Handles field elision (Sequential) by matching against _name_children.
    Returns the access chain from root down to the parent of the target.
    """
    if name == "":
        return []
    chain: list[tuple[Any, str]] = []
    current: Any = root
    parts = name.split(".")
    i = 0
    while i < len(parts):
        if not isinstance(current, Module):
            # descend into raw container
            key = parts[i]
            chain.append((current, key))
            if isinstance(current, (list, tuple)):
                current = current[int(key)]
            else:
                current = current[key]
            i += 1
            continue
        # Find the longest child-name match among this module's children
        matched = False
        for child_name, child in current._name_children():
            child_parts = child_name.split(".")
            n = len(child_parts)
            if parts[i : i + n] == child_parts:
                _record_hops(chain, current, child, child_name)
                current = child
                i += n
                matched = True
                break
        if not matched:
            raise KeyError(
                f"Cannot resolve {name!r}: no child matching "
                f"{'.'.join(parts[i:])!r} in {type(current).__name__}"
            )
    return chain


def _identity_path(value: Any, child: Any) -> Optional[list[tuple[Any, str]]]:
    """Hops from `value` down to the object `child` (by identity)."""
    if value is child:
        return []
    if isinstance(value, (list, tuple)):
        for i, v in enumerate(value):
            p = _identity_path(v, child)
            if p is not None:
                return [(value, str(i))] + p
    elif isinstance(value, dict):
        for k, v in value.items():
            p = _identity_path(v, child)
            if p is not None:
                return [(value, k)] + p
    return None


def _record_hops(
    chain: list, module: Module, child: Any, child_name: str = ""
) -> None:
    """Append the (container, key) hops leading from `module` to `child`.

    The child's NAME (from `_name_children`) drives resolution wherever it
    can, so aliased objects (tied submodules/arrays appearing under two
    fields, or the same block repeated in a Sequential) land on the right
    tree position; identity search is only the fallback for custom
    `_name_children` elisions whose names match neither a field nor a
    container key.
    """
    fields = type(module)._dynamic_fields
    head = child_name.split(".")[0] if child_name else None
    if head is not None:
        # 1. the common case: child name IS a field name
        if head in fields:
            value = getattr(module, head)
            if value is child:
                chain.append((module, head))
                return
            path = _identity_path(value, child)
            if path is not None:
                chain.append((module, head))
                chain.extend(path)
                return
        # 2. elided container (Sequential "0"): name keys into a field
        for fname in fields:
            value = getattr(module, fname)
            if isinstance(value, (list, tuple)) and head.isdigit():
                idx = int(head)
                if 0 <= idx < len(value) and value[idx] is child:
                    chain.append((module, fname))
                    chain.append((value, str(idx)))
                    return
            elif isinstance(value, dict) and head in value and value[head] is child:
                chain.append((module, fname))
                chain.append((value, head))
                return
    # 3. fallback: identity scan (custom renamed children)
    for fname in fields:
        value = getattr(module, fname)
        path = _identity_path(value, child)
        if path is not None:
            chain.append((module, fname))
            chain.extend(path)
            return
    raise KeyError(f"Cannot record hops to child in {module!r}")


def get_submodule(root: Module, name: str) -> Any:
    """Functional analogue of ``torch.nn.Module.get_submodule``."""
    if name == "":
        return root
    chain = _resolve(root, name)
    container, key = chain[-1]
    if isinstance(container, Module):
        return getattr(container, key)
    if isinstance(container, (list, tuple)):
        return container[int(key)]
    return container[key]


def _rebuild(chain: list[tuple[Any, str]], new_value: Any) -> Any:
    """Rebuild the root immutably with new_value substituted at chain end."""
    for container, key in reversed(chain):
        if isinstance(container, Module):
            new_value = container.replace(**{key: new_value})
        elif isinstance(container, tuple):
            idx = int(key)
            new_value = container[:idx] + (new_value,) + container[idx + 1 :]
        elif isinstance(container, list):
            idx = int(key)
            new_value = container[:idx] + [new_value] + container[idx + 1 :]
        elif isinstance(container, dict):
            d = dict(container)
            d[key] = new_value
            new_value = d
        else:
            raise TypeError(f"Cannot rebuild through {type(container)}")
    return new_value


def replace_submodule(root: T, name: str, new_submodule: Any) -> T:
    """Pure-functional analogue of ptdeco's ``replace_submodule_in_place``
    (/root/reference/src/ptdeco/utils/common.py:88-93)."""
    if name == "":
        return new_submodule
    chain = _resolve(root, name)
    return _rebuild(chain, new_submodule)


def replace_submodules(root: T, mapping: dict[str, Any]) -> T:
    for name, new in mapping.items():
        root = replace_submodule(root, name, new)
    return root


def get_leaf(root: Module, name: str) -> jax.Array:
    return get_submodule(root, name)


def update_leaf(root: T, name: str, value: Any) -> T:
    return replace_submodule(root, name, value)


# -- filtering (equinox-style partition/combine) ---------------------------


def buffer_leaf_ids(root: Module) -> set:
    """ids of leaves that are BUFFERS, not parameters: integer-typed arrays
    (index tables), BatchNorm running statistics, and any field a module
    lists in its ``_buffer_fields`` class attribute (torch analogue:
    ``register_buffer``).  Used to exclude them from "train everything"
    partitions — optimizing a shifted-window mask or BN stats corrupts
    the model."""
    import numpy as _np

    out: set = set()
    for _, m in named_modules(root):
        for fname in getattr(type(m), "_buffer_fields", ()):
            v = getattr(m, fname, None)
            if v is not None:
                out.add(id(v))
        if type(m).__name__ == "BatchNorm2d":
            for fname in ("running_mean", "running_var"):
                v = getattr(m, fname, None)
                if v is not None:
                    out.add(id(v))
    for leaf in jax.tree_util.tree_leaves(root):
        if hasattr(leaf, "dtype") and _np.issubdtype(leaf.dtype, _np.integer):
            out.add(id(leaf))
    return out


def trainable_predicate(root: Module) -> Callable[[tuple, Any], bool]:
    """Predicate for ``partition`` selecting every PARAMETER leaf (excludes
    buffers, see ``buffer_leaf_ids``)."""
    buf = buffer_leaf_ids(root)

    def pred(path, leaf):
        return id(leaf) not in buf

    return pred


def partition(
    root: T, predicate: Callable[[tuple, Any], bool]
) -> tuple[T, T]:
    """Split a module tree into (selected, rest) by a per-leaf predicate on
    (key_path, leaf).  Non-selected positions become None.  Used to freeze
    all but the trainable leaves (reference: lockd get_parameters_trainable,
    /root/reference/src/ptdeco/lockd/decomposition.py:462-473)."""
    leaves_with_paths = jax.tree_util.tree_leaves_with_path(root)
    selected_paths = {
        jax.tree_util.keystr(path)
        for path, leaf in leaves_with_paths
        if predicate(path, leaf)
    }

    def pick(path, leaf):
        return leaf if jax.tree_util.keystr(path) in selected_paths else None

    def drop(path, leaf):
        return None if jax.tree_util.keystr(path) in selected_paths else leaf

    selected = jax.tree_util.tree_map_with_path(pick, root)
    rest = jax.tree_util.tree_map_with_path(drop, root)
    return selected, rest


def combine(a: T, b: T) -> T:
    """Inverse of partition: take the non-None leaf at each position."""
    return jax.tree_util.tree_map(
        lambda x, y: x if x is not None else y,
        a,
        b,
        is_leaf=lambda v: v is None,
    )


def _keystr_prefix(chain: list[tuple[Any, str]]) -> str:
    """keystr of the tree position a `_resolve` chain ends at."""
    s = ""
    for container, key in chain:
        if isinstance(container, Module):
            s += f".{key}"
        elif isinstance(container, (list, tuple)):
            s += f"[{int(key)}]"
        else:
            s += f"[{key!r}]"
    return s


def tree_paths_of(root: Module, dotted_names: list[str]) -> set[str]:
    """Map dotted module names to the set of keystr paths of their leaves.

    Positional (prefix) matching, not leaf identity: tied/aliased arrays
    appearing elsewhere in the tree must not drag unrelated positions in.
    The full-tree walk happens once, not per name."""
    all_paths = [
        jax.tree_util.keystr(path)
        for path, _ in jax.tree_util.tree_leaves_with_path(root)
    ]
    out: set[str] = set()
    for dn in dotted_names:
        prefix = _keystr_prefix(_resolve(root, dn))
        for p in all_paths:
            if p == prefix or p.startswith(prefix + ".") or p.startswith(
                prefix + "["
            ):
                out.add(p)
    return out


# -- call context -----------------------------------------------------------


class Ctx:
    """Trace-time context threaded through module calls.

    Replaces three torch-side mechanisms of the reference in one pure-ish
    object created *inside* jitted functions:
      * forward hooks capturing layer inputs (WrappedDWAINLinear.forward
        storing self.input, dwain/decomposition.py:53-55) -> ``sow``;
      * per-layer stat attributes scanned after forward (lockd ``self.nsr``,
        lockd/decomposition.py:126-135) -> ``sow``;
      * implicit global RNG (gumbel_softmax) -> explicit folded keys.
    The ``sink`` dict is mutated only during tracing; jitted wrappers return
    it as part of their outputs.
    """

    def __init__(
        self,
        key: Optional[jax.Array] = None,
        train: bool = False,
        no_remat: bool = False,
    ) -> None:
        self.key = key
        self.train = train
        # set by capture paths (engine taps): values recorded during the
        # trace must not escape a jax.checkpoint region, so remat-capable
        # models must take their non-checkpointed path
        self.no_remat = no_remat
        self.sink: dict[str, dict[str, Any]] = {}

    def sow(self, name: str, tag: str, value: Any) -> None:
        self.sink.setdefault(tag, {})[name] = value

    def rng(self, rng_id: int) -> jax.Array:
        if self.key is None:
            raise ValueError("Ctx has no RNG key but a module requested one")
        return jax.random.fold_in(self.key, rng_id)
