"""Shared decomposition engine used by the dwain and falor policies.

The reference implements the same machinery twice with stateful module
surgery + forward hooks (dwain/decomposition.py:41-316 duplicated at
falor/decomposition.py:51-290).  Here it is one pure-functional engine:

  * **Tap capture** — instead of a wrapper module storing ``self.input``
    (reference dwain:53-55), target sites are wrapped *inside the jit trace*
    with a ``_Tap`` that records the flattened input into a trace-local dict;
    the jitted step returns the Gram updates.  No model mutation escapes the
    trace.
  * **Gram/covariance accumulation** — ``E[y yᵀ]`` partial sums are a single
    fused einsum per site per batch (reference dwain:147-152).  Batches may
    be sharded over a ``dp`` mesh axis; because the einsum contracts the
    batch dimension, XLA inserts the psum automatically and the accumulator
    stays replicated — this is the TPU-native replacement for the
    reference's serial single-GPU loop (dwain:607-611).
  * **Eigendecomposition** — float64 on host via LAPACK (numpy); TPUs have
    no native f64 and the matrices are at most (d_out, d_out).  Mirrors the
    reference's ``decompose_in_float64=True`` default (dwain:155-163) with
    the same 1% diagonal damping.
  * **Rank-masked candidate weights** — the low-rank candidate
    ``W_k = W uk ukᵀ`` is computed as ``K @ ((u * mask(rank)) @ uᵀ)`` where
    ``rank`` is a *traced* scalar, so trying every rank in the search ladder
    reuses ONE compiled program (the reference re-materializes U, V per rank,
    dwain:424-429; a naive port would recompile per rank).
  * **Metric evaluation** — deco/orig forwards run in one jitted step taking
    two structurally identical model pytrees, so the entire whole-model rank
    search compiles exactly once (reference does two eager forwards per
    batch per candidate, dwain:263-267).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from typing import Any, Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import nn

logger = logging.getLogger(__name__)

EIGEN_DAMPEN_FACTOR = 0.01  # reference dwain/decomposition.py:14

# above this many decomposeable sites, policies switch to the
# structure-shared metric step (one compile for the whole walk)
SHARED_METRIC_SITE_THRESHOLD = 12

ApplyFn = Callable[[nn.Module, Any, Optional[nn.Ctx]], jax.Array]


def default_apply(root: nn.Module, batch: Any, ctx: Optional[nn.Ctx] = None):
    return root(batch, ctx=ctx)


# ---------------------------------------------------------------------------
# Site discovery
# ---------------------------------------------------------------------------


def is_decomposeable_module(module: Any) -> bool:
    """Linear, or 1x1 Conv2d with groups==1 (reference dwain:540-546)."""
    if isinstance(module, nn.Linear):
        return True
    if isinstance(module, nn.Conv2d):
        return module.kernel_size == (1, 1) and module.groups == 1
    return False


def get_decomposeable_submodule_names(
    root: nn.Module, blacklisted_module_names: Optional[list[str]] = None
) -> list[str]:
    blacklist = set(blacklisted_module_names or [])
    res = []
    for name, mod in nn.named_modules(root):
        if name and is_decomposeable_module(mod):
            if name in blacklist:
                logger.info(f"Skipping blacklisted module {name}")
            else:
                res.append(name)
    return res


@dataclasses.dataclass(frozen=True)
class Site:
    name: str
    kind: str  # "linear" | "conv2d1x1"
    in_features: int
    out_features: int
    has_bias: bool
    dtype: Any

    @property
    def full_rank(self) -> int:
        return min(self.in_features, self.out_features)


def get_site(root: nn.Module, name: str) -> Site:
    m = nn.get_submodule(root, name)
    if isinstance(m, nn.Linear):
        return Site(
            name=name,
            kind="linear",
            in_features=m.in_features,
            out_features=m.out_features,
            has_bias=m.bias is not None,
            dtype=m.kernel.dtype,
        )
    if isinstance(m, nn.Conv2d) and m.kernel_size == (1, 1) and m.groups == 1:
        return Site(
            name=name,
            kind="conv2d1x1",
            in_features=m.in_channels,
            out_features=m.out_channels,
            has_bias=m.bias is not None,
            dtype=m.kernel.dtype,
        )
    raise ValueError(f"Cannot decompose {name}={m!r}")


def get_site_kernel2d(root: nn.Module, site: Site) -> jax.Array:
    """The (in, out) matrix of a site (conv 1x1 kernels are squeezed)."""
    m = nn.get_submodule(root, site.name)
    if site.kind == "linear":
        return m.kernel
    return m.kernel[0, 0]  # (1,1,in,out) -> (in,out)


def set_site_kernel2d(root: nn.Module, site: Site, kernel2d: jax.Array) -> nn.Module:
    if site.kind == "linear":
        return nn.replace_submodule(root, f"{site.name}.kernel", kernel2d)
    return nn.replace_submodule(
        root, f"{site.name}.kernel", kernel2d[None, None, :, :]
    )


def get_site_bias(root: nn.Module, site: Site) -> Optional[jax.Array]:
    return nn.get_submodule(root, site.name).bias


# ---------------------------------------------------------------------------
# Tap capture
# ---------------------------------------------------------------------------


class _Tap(nn.Module):
    """Wraps a site module during a traced forward, recording the flattened
    input into a trace-local store.  Never crosses a jit boundary."""

    inner: nn.Module
    site_name: str = nn.static_field(default="")
    store: Any = nn.static_field(default=None)

    def __call__(self, x: jax.Array, ctx: Optional[nn.Ctx] = None) -> jax.Array:
        c = x.shape[-1]
        self.store[self.site_name] = x.reshape(-1, c)
        return self.inner(x, ctx=ctx)

    def __getattr__(self, name: str):
        # transparent proxy: siblings may read site attributes (e.g. an
        # attention module reading q_proj.out_features)
        return getattr(object.__getattribute__(self, "inner"), name)


def _wrap_taps(root: nn.Module, site_names: list[str], store: dict) -> nn.Module:
    for name in site_names:
        inner = nn.get_submodule(root, name)
        root = nn.replace_submodule(
            root, name, _Tap(inner=inner, site_name=name, store=store)
        )
    return root


def fired_site_names(
    root: nn.Module,
    site_names: list[str],
    example_batch: Any,
    apply_fn: ApplyFn,
) -> list[str]:
    """The subset of ``site_names`` whose modules actually FIRE on a
    forward pass — via ``jax.eval_shape`` (abstract, no compute, no
    compile).  Modules can be dead at runtime (e.g. the k/v projections
    of gemma3n's KV-shared layers, or dropped multimodal towers); they
    capture no activations and cannot be calibrated or decomposed, so
    the walks must skip them.  The torch reference has no analogue: its
    hook-based capture (dwain:569-583) would silently produce an empty
    list and crash later in torch.cat."""
    store: dict[str, Any] = {}
    tapped = _wrap_taps(root, list(site_names), store)
    jax.eval_shape(
        lambda m, b: apply_fn(m, b, nn.Ctx(no_remat=True)),
        tapped,
        example_batch,
    )
    return [n for n in site_names if n in store]


# ---------------------------------------------------------------------------
# Gram / covariance accumulation
# ---------------------------------------------------------------------------

# cap on the stacked deferred-Gram activations a single chunk may
# materialize simultaneously (see make_gram_scan_step docstring); ~4 GB
# leaves plenty of a v5e's 16 GB for model + grams + metric batches
GRAM_DEFER_BUDGET_BYTES = 4 * 1024**3


def make_gram_scan_step(
    site_names: tuple[str, ...],
    sites: dict[str, Site],
    apply_fn: ApplyFn,
    accumulate_mean: bool = False,
    use_pallas: Any = "auto",
):
    """Jitted step consuming a chunk of K stacked batches in ONE
    dispatch via lax.scan — K fewer host round-trips.  Essential when the
    device sits behind a high-latency transport (per-call overhead measured
    at ~100ms over the axon tunnel vs ~1ms of MXU work on small models).

    Per-site HBM-traffic dispatch: accumulating a (d, d) f32 Gram inside
    the scan costs a read+write of 2d^2 floats per iteration (822 MB each
    way at Llama-8B's d=14336 — the measured bottleneck of the calibration
    pass), while stacking the per-iteration y and computing ONE Gram per
    chunk costs n*d extra activation traffic.  Each site statically takes
    whichever is cheaper: few-rows/huge-d LLM sites defer the Gram to the
    chunk level; many-rows vision 1x1 sites keep the in-scan accumulate.
    Deferred stacks materialize K*n*d per site simultaneously, so the
    total is capped by GRAM_DEFER_BUDGET_BYTES (largest-d sites first —
    they save the most traffic); sites over budget keep the in-scan
    accumulate.  Overall split memory is still bounded by
    ``precomputing_covariance_num_splits``."""

    def _site_y(root, x, name):
        """Site output y and its per-site static Gram strategy."""
        kernel = get_site_kernel2d(root, sites[name])
        from .ops.gram_pallas import should_use_syrk

        if use_pallas == "auto":
            # per-site static decision keyed on the ACTIVATION dtype
            # (deciding on a post-matmul f32 y.dtype was a bug that made
            # this branch dead, caught by an integration spy test)
            use = should_use_syrk(x.dtype, kernel.shape[-1])
        else:
            use = bool(use_pallas)
        if use:
            # SYRK path: y in ACTIVATION dtype at DEFAULT precision — one
            # MXU-native bf16 pass.  Computing y at f32-HIGHEST (6-pass)
            # only to round it back to bf16 for the kernel wasted ~6x the
            # matmul cost for precision the cast destroyed; matching the
            # forward's own x@W also lets XLA CSE the two.  The kernel
            # accumulates the Gram in f32 (23x vs the f32-HIGHEST einsum
            # at d=2048 n=8192 on v5e, max relative Gram error 2e-4,
            # BASELINE_MEASURED.md).
            y = jnp.dot(x, kernel.astype(x.dtype), preferred_element_type=x.dtype)
        else:
            y = jnp.dot(
                x,
                kernel.astype(x.dtype),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        return y, use

    def _gram(y, use):
        from .ops.gram_pallas import syrk_gram_partitioned

        if use:
            # custom_partitioning-wrapped: under dp/sp-sharded batches the
            # kernel runs on each device's local rows + psum (the einsum
            # path's communication pattern); single-device it is the bare
            # pallas SYRK
            return syrk_gram_partitioned(y)
        return jnp.einsum(
            "bp,bq->pq",
            y,
            y,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def _step(root, batches, grams, means):
        # per-site static strategy, recorded at trace time: (defer, use)
        strategy: dict[str, tuple[bool, bool]] = {}
        k_chunk = jax.tree_util.tree_leaves(batches)[0].shape[0]
        budget = {"left": GRAM_DEFER_BUDGET_BYTES}
        # visit largest-d sites first when ALLOCATING the defer budget —
        # they save the most accumulator traffic per stacked byte
        budget_order = sorted(
            site_names, key=lambda nm: -sites[nm].out_features
        )

        def body(carry, batch):
            grams, means = carry
            store: dict[str, jax.Array] = {}
            tapped = _wrap_taps(root, list(site_names), store)
            # Ctx (not None) disables remat: tap captures must not escape
            # a jax.checkpoint region
            _ = apply_fn(tapped, batch, nn.Ctx(no_remat=True))
            if not strategy:
                # single trace-time pass: decide (defer, use) per site,
                # allocating the stacked-bytes budget in benefit order
                from .ops.gram_pallas import should_use_syrk

                for nm in budget_order:
                    x_nm = store[nm]
                    n_nm, d_nm = x_nm.shape[0], sites[nm].out_features
                    if use_pallas == "auto":
                        use_nm = should_use_syrk(x_nm.dtype, d_nm)
                    else:
                        use_nm = bool(use_pallas)
                    y_itemsize = (
                        x_nm.dtype.itemsize if use_nm else 4  # f32 einsum y
                    )
                    stacked = k_chunk * n_nm * d_nm * y_itemsize
                    defer = n_nm < 2 * d_nm and stacked <= budget["left"]
                    if defer:
                        budget["left"] -= stacked
                    strategy[nm] = (defer, use_nm)
            ys_out = {}
            for name in site_names:
                x = store[name]
                y, use = _site_y(root, x, name)
                n, d = y.shape
                defer, _ = strategy[name]
                if defer:
                    ys_out[name] = y
                else:
                    grams = dict(grams)
                    grams[name] = grams[name] + _gram(y, use) / n
                if accumulate_mean:
                    means = dict(means)
                    means[name] = means[name] + jnp.mean(
                        y.astype(jnp.float32), axis=0
                    )
            return (grams, means), ys_out

        (grams, means), ys_stacked = jax.lax.scan(body, (grams, means), batches)
        for name, (defer, use) in strategy.items():
            if not defer:
                continue
            ys = ys_stacked[name]  # (K, n, d)
            k, n, d = ys.shape
            # sum_b (Y_b^T Y_b / n) == (Y_all^T Y_all) / n for equal-size
            # batches: one Gram per chunk, same value up to f32 summation
            # order
            grams = dict(grams)
            grams[name] = grams[name] + _gram(ys.reshape(k * n, d), use) / n
        return grams, means

    return _counted(jax.jit(_step, donate_argnums=(2, 3)))


def _stack_batches(batch_list: list[Any]) -> Any:
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *batch_list
    )


def compute_output_grams(
    root: nn.Module,
    site_names: list[str],
    data_iterator: Iterator[Any],
    num_data_steps: int,
    apply_fn: ApplyFn = default_apply,
    accumulate_mean: bool = False,
    scan_chunk: int = 8,
    use_pallas: Optional[bool] = None,
) -> tuple[dict[str, jax.Array], dict[str, jax.Array]]:
    """Run ``num_data_steps`` calibration batches, returning per-site
    ``E[y yᵀ]`` (and optionally ``E[y]``), already divided by the step count.

    TPU-native replacement for the reference's covariance loops
    (dwain:211-244 per-site, dwain:580-634 precomputed-in-splits): one jit
    compilation covers all sites in the list; batches are consumed in
    ``scan_chunk``-sized stacks so a chunk costs one dispatch; batches
    sharded over a ``dp`` mesh axis reduce via XLA-inserted psums.
    """
    sites = {n: get_site(root, n) for n in site_names}
    grams = {
        n: jnp.zeros((s.out_features, s.out_features), jnp.float32)
        for n, s in sites.items()
    }
    means = {n: jnp.zeros((s.out_features,), jnp.float32) for n, s in sites.items()}
    scan_chunk = max(1, min(scan_chunk, num_data_steps))
    if use_pallas is None:
        # auto: per-site SYRK when it measurably wins (TPU + bf16 + big d,
        # ops.gram_pallas.should_use_syrk); explicit True/False overrides
        use_pallas = "auto"
    elif use_pallas:
        # the SYRK path is mesh-legal (syrk_gram_partitioned runs the
        # kernel per shard + psum), so forcing it on a mesh is fine; it
        # still requires a TPU backend
        use_pallas = jax.default_backend() == "tpu"
    scan_step = make_gram_scan_step(
        tuple(site_names), sites, apply_fn, accumulate_mean, use_pallas
    )
    for sl in _chunk_slices(num_data_steps, scan_chunk):
        chunk = [next(data_iterator) for _ in range(sl.stop - sl.start)]
        grams, means = scan_step(root, _stack_batches(chunk), grams, means)
    grams = {n: g / num_data_steps for n, g in grams.items()}
    means = {n: m / num_data_steps for n, m in means.items()}
    return grams, means


# ---------------------------------------------------------------------------
# Batched candidate-rank metric evaluation
# ---------------------------------------------------------------------------

# Stacked metric batches above this budget fall back to per-candidate /
# chunked dispatches (vision batches are big; LLM token batches are tiny).
METRIC_STACK_BUDGET_BYTES = 256 * 1024 * 1024


def _batch_nbytes(batch: Any) -> int:
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(batch)
        if hasattr(x, "size")
    )


def _chunk_slices(total: int, max_chunk: int) -> list[slice]:
    """Split [0, total) into near-equal chunks of <= max_chunk with at most
    TWO distinct sizes (differing by 1).  A naive `range(0, n, chunk)` tail
    chunk has a different shape and forces a full XLA recompile of the
    whole-model program; balanced chunks cap that at 2 compiled shapes and
    usually 1 (when the split is even)."""
    if total <= 0:
        return []
    n_chunks = -(-total // max(1, max_chunk))
    base, rem = divmod(total, n_chunks)
    out, start = [], 0
    for i in range(n_chunks):
        size = base + (1 if i < rem else 0)
        out.append(slice(start, start + size))
        start += size
    return out


def make_ladder_metric_step(site: Site, apply_fn: ApplyFn, metric_fn):
    """One dispatch evaluating the ENTIRE rank ladder: scan over candidates
    (composing each masked low-rank weight on the fly — never materializing
    all candidates), inner scan over that candidate's metric batches.
    Returns raw per-(candidate, batch) metrics (C, M, K); aggregation and
    accept/reject stay on host with reference-identical semantics.

    The reference pays 2 eager whole-model forwards per batch per candidate
    with a host sync each (dwain:263-267, :435-448); this is one round-trip
    per site.
    """

    def _step(root, kernel2d, u, ranks, batches):
        def cand(_, inp):
            rank, cbatches = inp
            deco = compose_deco_kernel(kernel2d, u, rank)
            root_deco = set_site_kernel2d(root, site, deco)

            def mstep(_, batch):
                y_deco = apply_fn(root_deco, batch, None)
                y_orig = apply_fn(root, batch, None)
                return None, metric_fn(batch, y_deco, y_orig)

            _, ms = jax.lax.scan(mstep, None, cbatches)
            return None, ms

        _, out = jax.lax.scan(cand, None, (ranks, batches))
        return out  # (C, M, K)

    return _counted(jax.jit(_step))


# ---------------------------------------------------------------------------
# Dispatch accounting: host->device round-trips are the dominant overhead on
# high-latency transports (~100ms/dispatch measured over the axon tunnel),
# so the count is a first-class performance metric (bench.py reports it).
# ---------------------------------------------------------------------------

_DISPATCH_COUNT = {"n": 0}


def reset_dispatch_count() -> None:
    _DISPATCH_COUNT["n"] = 0


def dispatch_count() -> int:
    return _DISPATCH_COUNT["n"]


def _counted(fn):
    """Wrap a jitted step so each host-side invocation (one device
    dispatch) is tallied.  The underlying jitted callable stays reachable
    as ``.jitted`` for ``lower().compile().cost_analysis()`` — the FLOP
    source for the MFU accounting in aux/bench_calib_mfu.py."""

    def wrapper(*args, **kwargs):
        _DISPATCH_COUNT["n"] += 1
        return fn(*args, **kwargs)

    wrapper.jitted = fn
    return wrapper


def site_group_signature(site: Site) -> tuple:
    """Sites with equal signatures can share one indexed ladder program."""
    return (site.kind, site.in_features, site.out_features, str(site.dtype))


def make_indexed_ladder_metric_step(
    group: tuple[Site, ...], apply_fn: ApplyFn, metric_fn
):
    """POSITION-INDEXED ladder step: ONE compiled program serves EVERY site
    of a same-shape group — the target site is selected by a *traced*
    integer index, so neither the substituted leaf's tree position nor the
    site identity is baked into the HLO.

    For each group member j the program computes
    ``kernel_j = where(site_idx == j, deco, kernel_j)`` — a cheap select
    that XLA fuses — so transformer stacks (22 layers x 4 same-shaped
    projections) compile one program per projection shape instead of one
    per site.  Collapses the per-site compiles of the fused ladder
    (make_ladder_metric_step) while keeping its 1-dispatch-per-site cost;
    the reference eagerly re-runs the model per candidate per batch
    (dwain:435-448) and has no analogue."""

    def _step(root, site_idx, kernel2d, u, ranks, batches):
        def cand(_, inp):
            rank, cbatches = inp
            deco = compose_deco_kernel(kernel2d, u, rank)
            root_deco = root
            for j, site in enumerate(group):
                orig = get_site_kernel2d(root, site)
                newk = jnp.where(site_idx == j, deco.astype(orig.dtype), orig)
                root_deco = set_site_kernel2d(root_deco, site, newk)

            def mstep(_, batch):
                y_deco = apply_fn(root_deco, batch, None)
                y_orig = apply_fn(root, batch, None)
                return None, metric_fn(batch, y_deco, y_orig)

            _, ms = jax.lax.scan(mstep, None, cbatches)
            return None, ms

        _, out = jax.lax.scan(cand, None, (ranks, batches))
        return out  # (C, M, K)

    return _counted(jax.jit(_step))


def make_candidate_metric_step(site: Site, apply_fn: ApplyFn, metric_fn):
    """Single-candidate variant: (root, kernel2d, u, rank, batches[M]) ->
    (M, K).  Used when the full (C, M) stack would blow the memory budget
    and by falor's sequential binary search."""

    def _step(root, kernel2d, u, rank, batches):
        deco = compose_deco_kernel(kernel2d, u, rank)
        root_deco = set_site_kernel2d(root, site, deco)

        def mstep(_, batch):
            y_deco = apply_fn(root_deco, batch, None)
            y_orig = apply_fn(root, batch, None)
            return None, metric_fn(batch, y_deco, y_orig)

        _, ms = jax.lax.scan(mstep, None, batches)
        return ms

    return _counted(jax.jit(_step))


def make_shared_metric_step(apply_fn: ApplyFn, metric_fn):
    """Site-INDEPENDENT metric step: (root_deco, root_orig, batches[M]) ->
    (M, K).  Both roots have identical structure (root_deco is root with one
    kernel leaf substituted by value outside the jit), so ONE compilation
    serves every site and every candidate of a whole-model walk — the
    scaling mode for many-site LLMs, where the fused ladder's per-site
    compile (the substituted leaf's tree position is baked into its HLO)
    would dominate wall-clock."""

    def _step(root_deco, root_orig, batches):
        def mstep(_, batch):
            y_deco = apply_fn(root_deco, batch, None)
            y_orig = apply_fn(root_orig, batch, None)
            return None, metric_fn(batch, y_deco, y_orig)

        _, ms = jax.lax.scan(mstep, None, batches)
        return ms

    return _counted(jax.jit(_step))


class CandidateEvaluator:
    """Per-site evaluator of rank candidates.

    Evaluates candidates over fresh metric batches (drawn candidate-major —
    the reference's exact iterator consumption order, dwain:435-448) and
    returns raw per-(candidate, batch) metrics as (C, M, K) numpy.

    Three dispatch strategies:
      * ``indexed_step`` (pass one from make_indexed_ladder_metric_step
        plus this site's index in its shape group): one dispatch for the
        whole (C, M) grid AND one compile for the whole shape group;
      * fused ladder (default for few-site models): one dispatch for the
        whole (C, M) grid, but its program is site-specific;
      * ``shared_step`` (pass one from make_shared_metric_step, reused
        across ALL sites): one dispatch per candidate, one compile total.
    Either way batches are chunked under METRIC_STACK_BUDGET_BYTES."""

    def __init__(
        self,
        site: Site,
        apply_fn: ApplyFn,
        metric_fn,
        shared_step=None,
        indexed_step=None,
        group_index: int = 0,
    ) -> None:
        self.site = site
        self._shared = shared_step
        self._indexed = indexed_step
        self._group_index = group_index
        if shared_step is None and indexed_step is None:
            self._ladder = make_ladder_metric_step(site, apply_fn, metric_fn)
            self._cand = make_candidate_metric_step(site, apply_fn, metric_fn)

    def __call__(
        self,
        root: nn.Module,
        kernel2d: jax.Array,
        u_dev: jax.Array,
        ranks: list[int],
        metric_iterator: Iterator[Any],
        num_metric_steps: int,
    ) -> np.ndarray:
        c, m = len(ranks), num_metric_steps
        if c == 0 or m == 0:
            return np.zeros((c, m, 0), np.float32)
        all_batches = [
            [next(metric_iterator) for _ in range(m)] for _ in range(c)
        ]
        per_batch = _batch_nbytes(all_batches[0][0])
        max_m = max(1, METRIC_STACK_BUDGET_BYTES // max(per_batch, 1))

        if self._indexed is not None:
            idx = jnp.int32(self._group_index)
            ranks_arr = jnp.asarray(ranks, jnp.int32)
            if c * m * per_batch <= METRIC_STACK_BUDGET_BYTES:
                stacked = _stack_batches(
                    [_stack_batches(cb) for cb in all_batches]
                )
                out = self._indexed(root, idx, kernel2d, u_dev, ranks_arr, stacked)
                return np.asarray(jax.device_get(out))
            # over budget: chunk the metric batches.  The stack still
            # carries the full candidate axis, so the budget divides by c.
            max_m_idx = max(1, METRIC_STACK_BUDGET_BYTES // max(per_batch * c, 1))
            outs = []
            for sl in _chunk_slices(m, max_m_idx):
                stacked = _stack_batches(
                    [_stack_batches(cb[sl]) for cb in all_batches]
                )
                outs.append(
                    self._indexed(root, idx, kernel2d, u_dev, ranks_arr, stacked)
                )
            return np.asarray(jax.device_get(jnp.concatenate(outs, axis=1)))

        if self._shared is not None:
            rows = []
            for rank, cb in zip(ranks, all_batches):
                _DISPATCH_COUNT["n"] += 1  # host-side compose dispatch
                deco = compose_deco_kernel(kernel2d, u_dev, jnp.int32(rank))
                root_deco = set_site_kernel2d(root, self.site, deco)
                outs = [
                    self._shared(
                        root_deco, root, _stack_batches(cb[sl])
                    )
                    for sl in _chunk_slices(m, max_m)
                ]
                rows.append(jnp.concatenate(outs, axis=0))
            return np.asarray(jax.device_get(jnp.stack(rows)))

        if c * m * per_batch <= METRIC_STACK_BUDGET_BYTES:
            stacked = _stack_batches([_stack_batches(cb) for cb in all_batches])
            out = self._ladder(
                root, kernel2d, u_dev, jnp.asarray(ranks, jnp.int32), stacked
            )
            return np.asarray(jax.device_get(out))

        rows = []
        for rank, cb in zip(ranks, all_batches):
            outs = [
                self._cand(
                    root,
                    kernel2d,
                    u_dev,
                    jnp.int32(rank),
                    _stack_batches(cb[sl]),
                )
                for sl in _chunk_slices(m, max_m)
            ]
            rows.append(jnp.concatenate(outs, axis=0))
        return np.asarray(jax.device_get(jnp.stack(rows)))


# ---------------------------------------------------------------------------
# Eigendecomposition (host, float64)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("use_damping", "use_mean"))
def _eigvecs_device(
    gram: jax.Array,
    mean: jax.Array,
    use_damping: bool,
    use_mean: bool,
) -> jax.Array:
    g = gram
    if use_mean:
        g = g - jnp.outer(mean, mean)
    if use_damping:
        damp = EIGEN_DAMPEN_FACTOR * jnp.mean(jnp.diagonal(g))
        g = g + damp * jnp.eye(g.shape[-1], dtype=g.dtype)
    _, u = jnp.linalg.eigh(g)
    return u


def eigenvectors_from_gram(
    gram: jax.Array,
    *,
    mean: Optional[jax.Array] = None,
    use_damping: bool = True,
    in_float64: bool = True,
    top_k: Optional[int] = None,
):
    """Damped eigh of E[y yᵀ] (optionally mean-centred to a covariance),
    ascending eigenvalue order (LAPACK/torch convention — the top-k are the
    LAST k columns, which is what the rank slicing assumes).

    Float64 path (the reference's ``decompose_in_float64`` default,
    dwain:155-163, falor:165-208) runs on host CPU via LAPACK — TPUs have no
    native f64 and the matrices are per-layer.  With ``in_float64=False``
    the whole thing stays ON DEVICE as a jitted f32 eigh: no gram transfer,
    no host LAPACK — the fast path for large models behind a slow
    host<->device link.

    ``top_k`` (f64 path only): when only the top-k eigenvectors will be
    consumed AND k is small (<= d/4 — measured crossover on this LAPACK:
    dsyevr beats full dsyevd 1.3x at d/4, 1.9x at d/16, but LOSES at d/2
    where tridiagonalization dominates), solve the subset and return a
    (d, k) matrix, ascending within the subset.  Same subspace to fp
    rounding; all consumers slice/mask the LAST columns and accept
    (d, k)."""
    if not in_float64:
        m = mean if mean is not None else jnp.zeros(gram.shape[-1], gram.dtype)
        return _eigvecs_device(gram, m, use_damping, mean is not None)
    g = np.asarray(jax.device_get(gram), np.float64)
    if mean is not None:
        m = np.asarray(jax.device_get(mean), g.dtype)
        g = g - np.outer(m, m)
    if use_damping:
        damp = EIGEN_DAMPEN_FACTOR * float(np.mean(np.diag(g)))
        g = g + damp * np.eye(g.shape[-1], dtype=g.dtype)
    d = g.shape[-1]
    if top_k is not None and 0 < top_k <= d // 4:
        import scipy.linalg

        _, u = scipy.linalg.eigh(g, subset_by_index=[d - top_k, d - 1])
        return u
    _, u = np.linalg.eigh(g)
    return u


@functools.partial(jax.jit, static_argnames=("m", "iters"))
def _subspace_sketch(
    g: jax.Array, key: jax.Array, m: int, iters: int
) -> tuple[jax.Array, jax.Array]:
    """Randomized subspace iteration on device: orthonormal Q (d, m)
    approximately spanning the top-m eigenspace of PSD ``g``, plus the
    Rayleigh-Ritz projection B = Qᵀ G Q (m, m).  All matmuls ride the MXU
    in f32-highest; QR re-orthonormalizes between power iterations."""
    hi = jax.lax.Precision.HIGHEST
    om = jax.random.normal(key, (g.shape[0], m), jnp.float32)
    y = jnp.dot(g, om, precision=hi)
    q, _ = jnp.linalg.qr(y)
    for _ in range(iters):
        y = jnp.dot(g, q, precision=hi)
        q, _ = jnp.linalg.qr(y)
    gq = jnp.dot(g, q, precision=hi)
    b = jnp.dot(q.T, gq, precision=hi)
    b = (b + b.T) / 2
    return q, b


@jax.jit
def _project_back(q: jax.Array, v: jax.Array) -> jax.Array:
    return jnp.dot(q, v, precision=jax.lax.Precision.HIGHEST)


def randomized_topk_eigenvectors(
    gram: jax.Array,
    top_k: int,
    *,
    oversample: int = 64,
    power_iters: int = 2,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Top-``top_k`` eigenvectors of a PSD Gram via randomized subspace
    iteration (Halko et al. 2011), returned ASCENDING like eigh so the
    existing ``u[:, -rank:]`` slicing applies unchanged.

    TPU-first split of the work: the O(d² m) sketch/power matmuls + QR run
    on device in f32; only the small (m, m) Rayleigh-Ritz matrix is pulled
    to host for an exact f64 LAPACK eigh.  For d=2048, m≈1088 this is ~6x
    less host LAPACK work than the full f64 eigh the reference pays
    (dwain:155-163), and the d×d Gram never crosses the host link.

    Rank search only ever consumes the top int(full_rank*reduction_factor)
    eigenvectors (the first ladder candidate), so ``top_k = full_rank//2``
    loses nothing.  Eigenvector accuracy is bounded by the f32 Gram
    accumulation either way; decision parity vs the exact path is
    regression-tested (tests/test_randomized_evd.py)."""
    d = gram.shape[-1]
    m = min(d, top_k + oversample)
    if key is None:
        key = jax.random.PRNGKey(d)
    _DISPATCH_COUNT["n"] += 2  # sketch + project-back
    q, b = _subspace_sketch(gram.astype(jnp.float32), key, m, power_iters)
    b_host = np.asarray(jax.device_get(b), np.float64)
    _, v = np.linalg.eigh(b_host)  # ascending
    u = _project_back(q, jnp.asarray(v[:, -top_k:], jnp.float32))
    return u  # (d, top_k), ascending


def sketch_for_randomized_eigh(
    gram: jax.Array,
    top_k: int,
    *,
    oversample: int = 64,
    power_iters: int = 2,
    key: Optional[jax.Array] = None,
) -> tuple[jax.Array, np.ndarray]:
    """Device phase of randomized_topk_eigenvectors, split out so a caller
    can run the host eigh of B on a worker thread (pipelined decomposition)
    while keeping ALL device interaction on the main thread."""
    d = gram.shape[-1]
    m = min(d, top_k + oversample)
    if key is None:
        key = jax.random.PRNGKey(d)
    _DISPATCH_COUNT["n"] += 1
    q, b = _subspace_sketch(gram.astype(jnp.float32), key, m, power_iters)
    return q, np.asarray(jax.device_get(b), np.float64)


def finish_randomized_eigh(
    q: jax.Array, v_host: np.ndarray, top_k: int
) -> jax.Array:
    """Main-thread device phase completing a worker-thread eigh of B."""
    _DISPATCH_COUNT["n"] += 1
    return _project_back(q, jnp.asarray(v_host[:, -top_k:], jnp.float32))


# ---------------------------------------------------------------------------
# Rank-masked candidate composition + factor construction
# ---------------------------------------------------------------------------


@jax.jit
def compose_deco_kernel(
    kernel2d: jax.Array, u: jax.Array, rank: jax.Array
) -> jax.Array:
    """``K_deco = K @ ((u * mask) @ uᵀ)`` keeping the top-`rank` eigvecs.

    ``rank`` is traced: every candidate in a rank search reuses this one
    compiled program (cf. reference's per-rank U/V rebuild, dwain:424-429).
    Zeroing the masked columns gives exactly the projector ``uk ukᵀ``.
    """
    n = u.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    mask = (col >= n - rank).astype(u.dtype)
    proj = jnp.dot(
        u * mask,
        u.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    deco = jnp.dot(
        kernel2d.astype(jnp.float32),
        proj,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return deco.astype(kernel2d.dtype)


def build_factors(
    kernel2d: jax.Array, u: np.ndarray, rank: int
) -> tuple[jax.Array, jax.Array]:
    """Final factors at the accepted rank: ``K1 = K uk`` (in, rank) and
    ``K2 = ukᵀ`` (rank, out) so that ``y = (x @ K1) @ K2 (+ b)``.

    Equivalent to reference U = Wᵀ uk, V = ukᵀ with lin_1.weight = Uᵀ,
    lin_2.weight = Vᵀ (dwain:69-86,424-429) under our transposed layout.
    """
    uk = jnp.asarray(u[:, u.shape[1] - rank :], jnp.float32)
    k32 = kernel2d.astype(jnp.float32)
    k1 = jnp.dot(
        k32,
        uk,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    k2 = uk.T
    return k1.astype(kernel2d.dtype), k2.astype(kernel2d.dtype)


def build_decomposed_module(
    root: nn.Module, site: Site, k1: jax.Array, k2: jax.Array
) -> nn.Module:
    """Sequential factor pair matching the reference's layout
    (dwain:69-86 for Linear, dwain:119-144 for 1x1 conv): first factor
    bias-free, original bias moves to the second factor.

    Reference bug fixed here: the reference builds both factor convs with
    default stride/padding, silently breaking strided 1x1 convs (ResNet
    downsamples).  We put the original stride/padding/dilation on the FIRST
    factor — for a 1x1 conv, spatial subsampling commutes with channel
    mixing, and striding first is also cheaper (the second matmul sees the
    reduced resolution)."""
    bias = get_site_bias(root, site)
    m = nn.get_submodule(root, site.name)
    precision = getattr(m, "precision", None)
    if site.kind == "linear":
        return nn.Sequential(
            layers=(
                nn.Linear(kernel=k1, bias=None, precision=precision),
                nn.Linear(kernel=k2, bias=bias, precision=precision),
            )
        )
    else:
        first = nn.Conv2d(
            kernel=k1[None, None, :, :],
            bias=None,
            stride=m.stride,
            padding=m.padding,
            dilation=m.dilation,
            groups=1,
            padding_mode=m.padding_mode,
            precision=precision,
        )
        return nn.Sequential(
            layers=(first, nn.conv1x1_from_kernel(k2, bias, precision=precision))
        )


# ---------------------------------------------------------------------------
# Parameter-count bookkeeping (reference dwain:319-330, :569-577)
# ---------------------------------------------------------------------------


def get_params_for_proportion(
    proportion: float, in_features: int, out_features: int
) -> int:
    baseline = in_features * out_features
    original_rank = min(in_features, out_features)
    proposed = (in_features + out_features) * proportion * original_rank
    if proposed < baseline:
        return int(proposed)
    return baseline


def is_num_params_reduced(
    proportion: float, in_features: int, out_features: int
) -> bool:
    baseline = in_features * out_features
    original_rank = min(in_features, out_features)
    proposed = (in_features + out_features) * proportion * original_rank
    return proposed < baseline


def add_meta_to_module_config(
    module_config: dict[str, Any], module_deco_results: dict[str, Any]
) -> None:
    from .utils import modconfig

    meta = {
        k: v for k, v in module_deco_results.items() if k != "decomposed_module"
    }
    module_config[modconfig.MODCONFIG_META_KEY] = meta
