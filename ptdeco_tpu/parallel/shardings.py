"""Pattern-based parameter sharding rules (tensor parallelism).

Megatron-style TP layout for the transformer family: column-parallel
q/k/v/gate/up (+ lm_head / embedding over vocab), row-parallel o_proj/down,
norms replicated.  XLA inserts the all-reduces at the row-parallel outputs.
This is new capability relative to the reference (strictly single-GPU,
SURVEY.md §2.7) and is what lets Llama-scale calibration forwards fit on a
v5e-8.

Decomposed factor pairs ``{site}.0 / {site}.1`` inherit their parent's
layout: for a column-parallel site the *second* factor's out-dim is sharded
(K1 replicated, K2 column-sharded); for a row-parallel site the first
factor's in-dim is sharded.  The rank dimension is never sharded (it is
small by construction).
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import nn
from .mesh import EP_AXIS, TP_AXIS

__all__ = ["transformer_tp_rules", "shard_params", "sharding_tree"]

# (regex on dotted param name, PartitionSpec) — first match wins.
# Kernels are (in, out); embeddings (vocab, dim).
transformer_tp_rules: list[tuple[str, P]] = [
    # stacked MoE expert tensors (models.stack_moe_experts): the leading
    # expert axis shards over ep — true expert parallelism (each device
    # stores E/ep experts) — and the per-expert layout composes the usual
    # Megatron column/row TP.  On meshes without an ep (or tp) axis the
    # missing axis is stripped by sharding_tree, so the same rules serve
    # ep-only, tp-only and ep x tp meshes.
    (r".*\.w_gate$", P(EP_AXIS, None, TP_AXIS)),
    (r".*\.w_up$", P(EP_AXIS, None, TP_AXIS)),
    (r".*\.w_down$", P(EP_AXIS, TP_AXIS, None)),
    (r".*\.b_gate$", P(EP_AXIS, TP_AXIS)),
    (r".*\.b_up$", P(EP_AXIS, TP_AXIS)),
    (r".*\.b_down$", P(EP_AXIS, None)),
    # int8 stacked-expert scales (quant.quantize_stacked_moe): (E, out)
    # follows the matching w_* tensor's expert + out-dim layout
    (r".*\.scale_gate$", P(EP_AXIS, TP_AXIS)),
    (r".*\.scale_up$", P(EP_AXIS, TP_AXIS)),
    (r".*\.scale_down$", P(EP_AXIS, None)),
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj)\.kernel$", P(None, TP_AXIS)),
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj)\.bias$", P(TP_AXIS)),
    (r".*(o_proj|down_proj)\.kernel$", P(TP_AXIS, None)),
    (r".*(o_proj|down_proj)\.bias$", P()),
    # factor pairs of column-parallel sites: K2 column-sharded
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj)\.1\.kernel$", P(None, TP_AXIS)),
    # second-factor bias inherits the column-parallel layout (Qwen2 qkv
    # sites carry biases; replicating it forces a per-layer reshard)
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj)\.1\.bias$", P(TP_AXIS)),
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj)\.0\.kernel$", P()),
    # factor pairs of row-parallel sites: K1 row-sharded
    (r".*(o_proj|down_proj)\.0\.kernel$", P(TP_AXIS, None)),
    (r".*(o_proj|down_proj)\.1\.kernel$", P()),
    (r".*lm_head\.kernel$", P(None, TP_AXIS)),
    (r".*embed_tokens\.table$", P(TP_AXIS, None)),
    # int8 serving form (quant.QuantLinear): w_q is (in, out) like
    # kernel; the per-output-channel scale follows the out dim, so it
    # shards with column-parallel sites and replicates with row-parallel
    # ones (each shard dequantizes its own columns locally — no gathers)
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj)\.w_q$", P(None, TP_AXIS)),
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj)\.scale$", P(TP_AXIS)),
    (r".*(o_proj|down_proj)\.w_q$", P(TP_AXIS, None)),
    (r".*(o_proj|down_proj)\.scale$", P()),
    # quantized factor pairs mirror the factor-pair kernel rules
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj)\.1\.w_q$", P(None, TP_AXIS)),
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj)\.1\.scale$", P(TP_AXIS)),
    (r".*(q_proj|k_proj|v_proj|gate_proj|up_proj)\.0\.w_q$", P()),
    (r".*(o_proj|down_proj)\.0\.w_q$", P(TP_AXIS, None)),
    (r".*(o_proj|down_proj)\.1\.w_q$", P()),
    (r".*lm_head\.w_q$", P(None, TP_AXIS)),
    (r".*lm_head\.scale$", P(TP_AXIS)),
    (r".*", P()),  # default: replicate
]


def _spec_for(name: str, rules: list[tuple[str, P]]) -> P:
    for pattern, spec in rules:
        if re.fullmatch(pattern, name):
            return spec
    return P()


def sharding_tree(
    model: nn.Module,
    mesh: Mesh,
    rules: Optional[list[tuple[str, P]]] = None,
) -> Any:
    """A pytree of NamedShardings matching the model, from name-based rules."""
    rules = rules if rules is not None else transformer_tp_rules
    specs = {
        name: _spec_for(name, rules) for name, _ in nn.named_parameters(model)
    }

    name_iter = iter(nn.named_parameters(model))

    def assign(leaf):
        name, arr = next(name_iter)
        spec = specs[name]
        # strip axes the mesh doesn't have (rules mention ep/tp; a pure-dp
        # or tp-only mesh just replicates along the absent axis) ...
        spec = P(*(a if a in mesh.shape else None for a in spec))
        # ... and drop specs that don't divide the dims evenly -> replicate
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            if arr.shape[dim] % mesh.shape[axis] != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map(assign, model)


def shard_params(
    model: nn.Module,
    mesh: Mesh,
    rules: Optional[list[tuple[str, P]]] = None,
) -> nn.Module:
    """device_put the model with TP shardings."""
    shardings = sharding_tree(model, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, model, shardings)
