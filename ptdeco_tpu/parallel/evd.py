"""Fully distributed top-k EVD of a PSD Gram over a device mesh.

The single-device randomized path (engine.randomized_topk_eigenvectors)
already accepts a mesh-sharded Gram: GSPMD partitions the G @ Q products
row-wise, but the thin (d, m) iterate is gathered onto ONE device for
``jnp.linalg.qr`` every power iteration — at Llama-8B down_proj width
(d=14336) that QR is the serial bottleneck and its workspace must fit a
single chip.  This module removes that last single-device stage: the
orthonormalization itself is distributed via **shifted CholeskyQR**
(Fukaya et al. 2014/2020), the communication-optimal tall-skinny QR for
meshes —

    W  = psum(Yᵀ_blk Y_blk)          # (m, m), the ONLY collective
    R  = chol(W + s·I)               # small, replicated, every device
    Q  = Y R⁻ᵀ                       # local triangular solve per block

so each device touches only its (d/P, m) row block and the per-pass
communication is one m² psum riding ICI (the reference has no analogue:
its eigh is a host-serial f64 LAPACK call on the full d² Gram,
/root/reference/src/ptdeco/dwain/decomposition.py:155-163).

Numerics: a single CholeskyQR pass loses orthogonality like κ(Y)²ε, so the
first pass shifts the Gram of the iterate (s ∝ ε·tr(W)/m keeps the factor
positive-definite even when Y is numerically rank-deficient, e.g. a Gram
whose spectrum dies into the noise floor inside the m-wide sketch) and two
further unshifted passes restore orthonormality to O(ε) — the standard
shiftedCholeskyQR3 recipe.  All tall matmuls run f32-HIGHEST on the MXU;
only the (m, m) Rayleigh–Ritz matrix crosses to the host for an exact f64
LAPACK eigh, exactly like the randomized path.

Everything here is deliberately expressed with shard_map + explicit
collectives (psum / all_gather over the flattened mesh axes) rather than
GSPMD annotations: the access pattern is known, static, and identical
every call, so hand-placing the collectives guarantees the gather-free
schedule instead of hoping the partitioner finds it.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

__all__ = [
    "distributed_topk_eigenvectors",
    "distributed_sketch_for_eigh",
    "finish_distributed_eigh",
]

_HI = jax.lax.Precision.HIGHEST

# relative shift applied to the first CholeskyQR pass; chosen ≫ f32 ε so
# the shifted factor stays PD for numerically rank-deficient iterates, and
# small enough that the two clean-up passes erase its effect on Q
_CHOLQR_SHIFT = 1e-5


def _cholqr(y: jax.Array, axes, passes: int = 3) -> jax.Array:
    """Distributed thin QR of a row-sharded Y (runs INSIDE shard_map):
    returns the orthonormal factor, still row-sharded.  ``axes`` are the
    mesh axis names the rows are split over."""
    m = y.shape[1]
    eye = jnp.eye(m, dtype=jnp.float32)
    for i in range(passes):
        w = jax.lax.psum(jnp.dot(y.T, y, precision=_HI), axes)
        if i == 0:
            w = w + (_CHOLQR_SHIFT * (jnp.trace(w) / m + 1e-30)) * eye
        ell = jnp.linalg.cholesky(w)  # W = L Lᵀ  =>  R_qr = Lᵀ
        # Q = Y R⁻¹ = Y L⁻ᵀ, solved block-locally
        y = jax.lax.linalg.triangular_solve(
            ell, y, left_side=False, lower=True, transpose_a=True
        )
    return y


def _build_sketch(mesh: Mesh, power_iters: int):
    """shard_map'd subspace iteration: (row-sharded G, replicated Ω) ->
    (row-sharded Q, replicated Rayleigh–Ritz B)."""
    axes = tuple(mesh.axis_names)
    spec_rows = P(axes, None)
    spec_rep = P(None, None)

    def body(g_blk: jax.Array, om: jax.Array):
        y = jnp.dot(g_blk, om, precision=_HI)  # (d/P, m)
        q = _cholqr(y, axes)
        for _ in range(power_iters):
            # G's columns need ALL rows of Q: gather the THIN iterate
            # (d·m floats over ICI), never the d² Gram
            q_full = jax.lax.all_gather(q, axes, axis=0, tiled=True)
            y = jnp.dot(g_blk, q_full, precision=_HI)
            q = _cholqr(y, axes)
        q_full = jax.lax.all_gather(q, axes, axis=0, tiled=True)
        gq = jnp.dot(g_blk, q_full, precision=_HI)  # (d/P, m)
        b = jax.lax.psum(jnp.dot(q.T, gq, precision=_HI), axes)
        return q, (b + b.T) / 2

    return jax.jit(
        jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(spec_rows, spec_rep),
            out_specs=(spec_rows, spec_rep),
        )
    )


def _resolve_mesh(gram: jax.Array, mesh: Optional[Mesh]) -> Mesh:
    """Explicit mesh > the Gram's own mesh > a flat mesh over all devices."""
    if mesh is not None:
        return mesh
    sharding = getattr(gram, "sharding", None)
    if isinstance(sharding, NamedSharding) and sharding.mesh.size > 1:
        return sharding.mesh
    devices = np.asarray(jax.devices())
    return Mesh(devices.reshape(-1), ("evd",))


_SKETCH_CACHE: dict = {}


def _sketch_fn(mesh: Mesh, power_iters: int):
    key = (tuple(mesh.axis_names), tuple(d.id for d in mesh.devices.flat),
           tuple(mesh.devices.shape), power_iters)
    fn = _SKETCH_CACHE.get(key)
    if fn is None:
        fn = _SKETCH_CACHE[key] = _build_sketch(mesh, power_iters)
    return fn


def distributed_sketch_for_eigh(
    gram: jax.Array,
    top_k: int,
    *,
    mesh: Optional[Mesh] = None,
    oversample: int = 64,
    power_iters: int = 2,
    key: Optional[jax.Array] = None,
) -> tuple[jax.Array, np.ndarray]:
    """Device phase of the distributed EVD: row-sharded orthonormal Q plus
    the host-side (m, m) Rayleigh–Ritz matrix.  Mirrors the contract of
    engine.sketch_for_randomized_eigh so the pipelined precompute path
    (worker-thread host eigh) reuses engine.finish_randomized_eigh.

    Falls back to replicating over a 1-device mesh when d is not divisible
    by the mesh size (shard_map needs even row blocks); callers targeting
    the fallback regime should use the randomized GSPMD path instead.
    """
    d = gram.shape[-1]
    m = min(d, top_k + oversample)
    mesh = _resolve_mesh(gram, mesh)
    n_dev = mesh.size
    if d % n_dev != 0:
        logger.warning(
            "distributed EVD: d=%d not divisible by %d devices; "
            "running on a single-device mesh (consider eigh_method="
            "'randomized' for this site)",
            d,
            n_dev,
        )
        mesh = Mesh(np.asarray(mesh.devices).reshape(-1)[:1], ("evd",))
    if key is None:
        key = jax.random.PRNGKey(d)
    om = jax.random.normal(key, (d, m), jnp.float32)
    g32 = gram.astype(jnp.float32)
    axes = tuple(mesh.axis_names)
    g_sh = jax.device_put(g32, NamedSharding(mesh, P(axes, None)))
    om_sh = jax.device_put(om, NamedSharding(mesh, P(None, None)))
    q, b = _sketch_fn(mesh, power_iters)(g_sh, om_sh)
    from ptdeco_tpu import engine  # local import: engine must not import us

    engine._DISPATCH_COUNT["n"] += 1
    return q, np.asarray(jax.device_get(b), np.float64)


def finish_distributed_eigh(
    q: jax.Array, v_host: np.ndarray, top_k: int
) -> jax.Array:
    """Project the host eigenvectors of B back through the (row-sharded)
    basis: u = Q·V[:, -k:], still row-sharded."""
    from ptdeco_tpu import engine

    return engine.finish_randomized_eigh(q, v_host, top_k)


def distributed_topk_eigenvectors(
    gram: jax.Array,
    top_k: int,
    *,
    mesh: Optional[Mesh] = None,
    oversample: int = 64,
    power_iters: int = 2,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Top-``top_k`` eigenvectors (ASCENDING, like eigh — ``u[:, -rank:]``
    slicing applies unchanged) of a PSD Gram, computed without any
    single-device stage larger than (m, m).

    The result is row-sharded over the mesh; downstream consumers (the
    rank-ladder evaluator composes K = U_r U_rᵀ W) work on it directly —
    GSPMD re-shards as the consuming computation requires."""
    q, b_host = distributed_sketch_for_eigh(
        gram,
        top_k,
        mesh=mesh,
        oversample=oversample,
        power_iters=power_iters,
        key=key,
    )
    _, v = np.linalg.eigh(b_host)  # ascending
    return finish_distributed_eigh(q, v, top_k)
