"""DWAIN — Decomposing Weights Algorithm, an Iterative techNique (TPU-native).

Functional re-implementation of the reference algorithm
(/root/reference/src/ptdeco/dwain/decomposition.py:677-800): iterative
whole-model low-rank decomposition with a geometric rank ladder, guided by
per-channel NSR and perplexity deltas, with optional interleaved recovery
fine-tuning and optional precomputation of all covariance eigenbases in
splits.

Differences by design (see ptdeco_tpu/engine.py for the mechanisms):
  * the model is a pytree; "surgery" returns new models, nothing mutates;
  * candidate weights are rank-masked projections so the entire rank ladder
    reuses one compiled metric program;
  * calibration batches may arrive sharded over a ``dp`` mesh axis — the
    Gram einsum reduction makes XLA insert the cross-device psum;
  * eigh runs in float64 on the host (TPUs have no native f64).

Semantics (acceptance rules, thresholds, bookkeeping, meta fields, and the
decompose_config format) match the reference exactly.
"""

from __future__ import annotations

import itertools
import json
import logging
import os
import pathlib
import time
from typing import Any, Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import engine, nn, utils

__all__ = ["decompose", "is_decomposeable_module"]

logger = logging.getLogger(__name__)

is_decomposeable_module = engine.is_decomposeable_module

SHARED_METRIC_SITE_THRESHOLD = engine.SHARED_METRIC_SITE_THRESHOLD

LossFn = Callable[[Any, jax.Array], jax.Array]
FinetuneFn = Callable[[nn.Module, list[str]], nn.Module]


def _make_metric_fn(loss_fn: LossFn):
    """Per-batch metrics [nsr, exp(loss_deco), exp(loss_orig)] — reference
    _compute_metrics (dwain:247-278): NSR over dims (0, 1), "ppl" =
    exp(loss)."""

    def metric_fn(batch: Any, y_deco: jax.Array, y_orig: jax.Array):
        loss_deco = loss_fn(batch, y_deco)
        loss_orig = loss_fn(batch, y_orig)
        nsr = utils.calc_per_channel_noise_to_signal_ratio(
            x=y_deco, y=y_orig, non_channel_dim=(0, 1)
        )
        return jnp.stack([nsr, jnp.exp(loss_deco), jnp.exp(loss_orig)])

    return metric_fn


def _process_module(
    *,
    root: nn.Module,
    site: engine.Site,
    data_iterator: Iterator[Any],
    metric_iterator: Iterator[Any],
    metric_fn,
    apply_fn: engine.ApplyFn,
    nsr_final_threshold: float,
    num_data_steps: int,
    num_metric_steps: int,
    num_params: int,
    min_rank: int,
    trade_off_factor: float,
    reduction_factor: float,
    max_accepted_ppl_diff: float,
    decompose_in_float64: bool,
    use_pallas_gram: Optional[bool],
    u_matrix: Optional[np.ndarray],
    shared_metric_step=None,
    indexed_step_info: Optional[tuple[Any, int]] = None,
    eigh_method: str = "exact",
) -> dict[str, Any]:
    indent = "    "
    msg_prefix = f"Processing {site.name}:"

    dim_in, dim_out = site.in_features, site.out_features
    full_rank = site.full_rank

    if full_rank == 1:
        logger.info(f"{msg_prefix} Module has rank 1, not decomposing")
        return {
            "proportion": 1.0,
            "nsr_final": 0.0,
            "ppl_final": 0.0,
            "drop_in_params": 0,
            "decomposed_module": None,
        }

    logger.info(
        f"{msg_prefix} {site.kind} in={dim_in} out={dim_out} {site.dtype}"
    )
    logger.info(
        f"{msg_prefix} {nsr_final_threshold=:.4f} {max_accepted_ppl_diff=:.4f}"
    )

    kernel2d = engine.get_site_kernel2d(root, site)

    if u_matrix is None:
        grams, _ = engine.compute_output_grams(
            root,
            [site.name],
            data_iterator,
            num_data_steps,
            apply_fn,
            use_pallas=use_pallas_gram,
        )
        method = _resolve_eigh_method(site, eigh_method)
        if method == "randomized":
            u_matrix = engine.randomized_topk_eigenvectors(
                grams[site.name], _site_top_k(site, reduction_factor)
            )
        elif method == "distributed":
            from ptdeco_tpu.parallel import evd as parallel_evd

            u_matrix = parallel_evd.distributed_topk_eigenvectors(
                grams[site.name], _site_top_k(site, reduction_factor)
            )
        else:
            u_matrix = engine.eigenvectors_from_gram(
                grams[site.name],
                use_damping=True,
                in_float64=decompose_in_float64,
                # the ladder never evaluates above full_rank*reduction:
                # subset-solve only the consumed eigvecs (dsyevr, ~2x)
                top_k=_site_top_k(site, reduction_factor),
            )
        logger.info(f"Computed u_matrix, dtype={u_matrix.dtype}")
    else:
        logger.info(f"Using pre-computed u_matrix, dtype={u_matrix.dtype}")

    u_dev = jnp.asarray(u_matrix, jnp.float32)

    # Enumerate the geometric ladder first (host arithmetic only, identical
    # control flow to reference dwain:407-421 incl. the drop==0 skip), then
    # evaluate ALL candidates' metrics in as few dispatches as possible.
    ladder: list[tuple[int, int, float]] = []  # (rank, drop, ppl_threshold)
    # int(r*f) < r for every f < 1, so the ladder always terminates; at
    # f >= 1 it would spin forever (the reference inherits this hang,
    # dwain:407-421) — fail loudly instead.
    if not 0.0 < reduction_factor < 1.0:
        raise ValueError(
            f"{reduction_factor=} must be in (0, 1) — at >=1 the rank "
            "ladder never descends (reference default: 0.5)"
        )
    rank_new = full_rank
    while rank_new > min_rank:
        rank_new = int(rank_new * reduction_factor)
        previous_params = engine.get_params_for_proportion(1.0, dim_in, dim_out)
        current_params = engine.get_params_for_proportion(
            rank_new / full_rank, dim_in, dim_out
        )
        drop = previous_params - current_params
        if drop == 0:
            logger.info(
                f"{indent}{rank_new=} does not lead to params drop, skipping"
            )
            continue
        ladder.append((rank_new, drop, drop / num_params * trade_off_factor))

    evaluator = engine.CandidateEvaluator(
        site,
        apply_fn,
        metric_fn,
        shared_step=shared_metric_step,
        indexed_step=indexed_step_info[0] if indexed_step_info else None,
        group_index=indexed_step_info[1] if indexed_step_info else 0,
    )
    raw = evaluator(
        root,
        kernel2d,
        u_dev,
        [r for r, _, _ in ladder],
        metric_iterator,
        num_metric_steps,
    )  # (C, M, 3): [nsr, ppl_deco, ppl_orig] per batch

    rank_best = full_rank
    nsr_best, ppl_deco_best = 0.0, 0.0
    drop_in_params = 0
    any_candidate_tried = len(ladder) > 0

    for i, ((rank_new, drop, ppl_diff_threshold), row) in enumerate(
        zip(ladder, raw), start=1
    ):
        nsr_new = float(np.mean(row[:, 0]))
        ppl_deco_new = float(np.mean(row[:, 1]))
        ppl_diff_new = float(np.mean((row[:, 1] - row[:, 2]) / row[:, 2]))
        fraction_removed = drop / num_params

        logger.info(
            f"{indent}{i=} {ppl_deco_new=:.4f} {ppl_diff_new=:.4f} "
            f"{ppl_diff_threshold=:.4f} {fraction_removed=:.4f} {nsr_new=:.4f}"
        )

        # acceptance rules — reference dwain:460-470
        msg1 = f"{indent}{i=} REJECTING rank {rank_new}/{full_rank}"
        if ppl_diff_new >= ppl_diff_threshold:
            logger.info(f"{msg1} {ppl_diff_new=:.2f} >= {ppl_diff_threshold=:.2f}")
        elif ppl_diff_new >= max_accepted_ppl_diff:
            logger.info(f"{msg1} {ppl_diff_new=:.3f} >= {max_accepted_ppl_diff:.3f}")
        elif nsr_new >= nsr_final_threshold:
            logger.info(f"{msg1} {nsr_new=:.4f} >= {nsr_final_threshold=:.4f}")
        else:
            rank_best = rank_new
            nsr_best = nsr_new
            ppl_deco_best = ppl_deco_new
            logger.info(f"{indent}{i=} ACCEPTING rank {rank_best}/{full_rank}")

        logger.info(
            f"{indent}{i=} {rank_new=}/{full_rank} {nsr_new=:.6f} "
            f"{ppl_diff_new=:.6f} {rank_best=} {nsr_best=:.6f} "
            f"{ppl_deco_best=:.6f}"
        )

    if any_candidate_tried:
        proportion = rank_best / full_rank
        logger.info(
            f"{indent}i=FINAL rank={rank_best}/{full_rank} {proportion=:.4f} "
            f"nsr={nsr_best:.6f} ppl={ppl_deco_best:.6f}"
        )
        decompose_decision = engine.is_num_params_reduced(
            proportion, dim_in, dim_out
        )
        if not decompose_decision:
            logger.info(
                f"{indent}{proportion=:.4f} leads to num param increase, "
                "not decomposing"
            )
    else:
        decompose_decision = False

    if any_candidate_tried and full_rank != rank_best and decompose_decision:
        k1, k2 = engine.build_factors(kernel2d, u_matrix, rank_best)
        new_module = engine.build_decomposed_module(root, site, k1, k2)
        previous_params = engine.get_params_for_proportion(1.0, dim_in, dim_out)
        current_params = engine.get_params_for_proportion(
            proportion, dim_in, dim_out
        )
        drop_in_params = previous_params - current_params
    else:
        proportion = 1.0
        nsr_best = 0.0
        ppl_deco_best = 0.0
        drop_in_params = 0
        new_module = None
        logger.info(f"{msg_prefix} Skipping module decomposition")

    return {
        "proportion": proportion,
        "nsr_final": nsr_best,
        "ppl_final": ppl_deco_best,
        "drop_in_params": drop_in_params,
        "decomposed_module": new_module,
    }


class _AsyncUProvider:
    """PIPELINED eigendecomposition: the per-site host LAPACK work runs on
    one worker thread in walk order while the main thread keeps dispatching
    gram/ladder programs to the device.  Only the MAIN thread ever touches
    JAX (worker jobs are pure numpy), so no two threads race on the
    device transport.  The reference computes every eigh serially on the
    critical path (dwain:618-621); here all but the first overlap with
    device metric evaluation."""

    def __init__(self) -> None:
        import concurrent.futures

        self._ex = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        self._jobs: dict[str, Any] = {}
        self._finalize: dict[str, Any] = {}

    def submit(self, name: str, host_job, finalize=None) -> None:
        self._jobs[name] = self._ex.submit(host_job)
        if finalize is not None:
            self._finalize[name] = finalize

    def put(self, name: str, value: Any) -> None:
        """Already-materialized entry (device-side eigh path)."""
        self._jobs[name] = value

    def pop(self, name: str, default: Any = None) -> Any:
        job = self._jobs.pop(name, None)
        if job is None:
            return default
        res = job.result() if hasattr(job, "result") else job
        fin = self._finalize.pop(name, None)
        return fin(res) if fin is not None else res

    def __len__(self) -> int:
        return len(self._jobs)

    def shutdown(self) -> None:
        self._ex.shutdown(wait=False)


def _site_top_k(site: engine.Site, reduction_factor: float) -> int:
    """Largest rank the geometric ladder ever evaluates — the only
    eigenvectors a dwain walk consumes (reference dwain:407-429)."""
    return max(1, int(site.full_rank * reduction_factor))


# sites at/above this width switch to the randomized EVD under "auto"
# (host f64 LAPACK on a 8192² gram is ~2 minutes on one core; the
# randomized path moves the O(d² k) work onto the MXU)
AUTO_RANDOMIZED_EIGH_MIN_RANK = 4096


def _resolve_eigh_method(site: engine.Site, eigh_method: str) -> str:
    """exact: host LAPACK f64 on the full Gram (reference numerics,
    dwain:155-163).  randomized: device subspace sketch, GSPMD-sharded
    matmuls, single-device thin QR.  distributed: shard_map subspace
    iteration with CholeskyQR — no single-device stage larger than m²
    (parallel/evd.py).  auto: randomized above the width where host
    LAPACK becomes the bottleneck."""
    if eigh_method not in ("auto", "exact", "randomized", "distributed"):
        raise ValueError(
            f"{eigh_method=} not in ('auto', 'exact', 'randomized', "
            "'distributed')"
        )
    if eigh_method == "auto":
        return (
            "randomized"
            if site.full_rank >= AUTO_RANDOMIZED_EIGH_MIN_RANK
            else "exact"
        )
    return eigh_method


def _precompute_u_in_splits(
    *,
    root: nn.Module,
    modules_to_decompose: list[str],
    num_splits: int,
    num_data_steps: int,
    data_iterator: Iterator[Any],
    apply_fn: engine.ApplyFn,
    decompose_in_float64: bool,
    use_pallas_gram: Optional[bool] = None,
    eigh_method: str = "exact",
    reduction_factor: float = 0.5,
) -> _AsyncUProvider:
    """Precompute eigenbases for all sites, in memory-bounded splits
    (reference dwain:580-674).  One jitted forward per batch accumulates all
    Grams of a split simultaneously; the host eighs are then PIPELINED in
    walk order (see _AsyncUProvider) instead of blocking up front."""
    provider = _AsyncUProvider()
    host_jobs: dict[str, tuple[Any, Any]] = {}
    # ceil-divide so every module is covered (the reference's floor-divide
    # chunking drops trailing modules when len % num_splits > chunk_size and
    # then dies on its own assert, dwain:589-607)
    num_splits = max(1, min(num_splits, len(modules_to_decompose)))
    chunk_size = -(-len(modules_to_decompose) // num_splits)
    num_partitions = num_splits
    for partition_index in range(num_partitions):
        sublist = modules_to_decompose[
            partition_index * chunk_size : (partition_index + 1) * chunk_size
        ]
        if not sublist:
            continue
        logger.info(
            f"Pre-computing covariance matrices for {len(sublist)} modules"
        )
        grams, _ = engine.compute_output_grams(
            root,
            sublist,
            data_iterator,
            num_data_steps,
            apply_fn,
            use_pallas=use_pallas_gram,
        )
        for name in sublist:
            site = engine.get_site(root, name)
            method = _resolve_eigh_method(site, eigh_method)
            if method in ("randomized", "distributed"):
                top_k = _site_top_k(site, reduction_factor)
                if method == "distributed":
                    from ptdeco_tpu.parallel import evd as parallel_evd

                    q, b_host = parallel_evd.distributed_sketch_for_eigh(
                        grams[name], top_k
                    )
                else:
                    q, b_host = engine.sketch_for_randomized_eigh(
                        grams[name], top_k
                    )
                host_jobs[name] = (
                    lambda b=b_host: np.linalg.eigh(b)[1],
                    lambda v, q=q, k=top_k: engine.finish_randomized_eigh(
                        q, v, k
                    ),
                )
            elif decompose_in_float64:
                g_host = np.asarray(jax.device_get(grams[name]), np.float64)
                k = _site_top_k(site, reduction_factor)
                host_jobs[name] = (
                    lambda g=g_host, k=k: engine.eigenvectors_from_gram(
                        g, use_damping=True, in_float64=True, top_k=k
                    ),
                    None,
                )
            else:
                provider.put(
                    name,
                    engine.eigenvectors_from_gram(
                        grams[name], use_damping=True, in_float64=False
                    ),
                )
        del grams
    # submit host work in WALK order (reversed discovery) so the first
    # site the walk needs is the first eigh computed
    for name in reversed(modules_to_decompose):
        if name in host_jobs:
            job, finalize = host_jobs[name]
            provider.submit(name, job, finalize)
    assert len(provider) == len(modules_to_decompose)
    return provider


def _pair_kernels(pair: nn.Module, site: engine.Site):
    """(k1, k2, bias) of a factor-pair Sequential, as 2D matrices."""
    if site.kind == "linear":
        return pair[0].kernel, pair[1].kernel, pair[1].bias
    return pair[0].kernel[0, 0], pair[1].kernel[0, 0], pair[1].bias


@jax.jit
def _compose_pair(k1: jax.Array, k2: jax.Array) -> jax.Array:
    return jnp.dot(
        k1.astype(jnp.float32),
        k2.astype(jnp.float32),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(k1.dtype)


class _DeferredPairs:
    """Structure-preserving substitution of accepted factor pairs.

    Replacing a site with its Sequential pair changes the model pytree's
    STRUCTURE, so every jitted whole-model program (gram, ladder, metric,
    fine-tune) recompiles after each accepted layer — for a many-site LLM
    that is hundreds of multi-minute compiles.  Instead the working model
    keeps its original structure with the site kernel set to the composed
    full-shape product ``k1 @ k2`` (exactly the weight the rank search
    evaluated, reference dwain:424-429), and the real pairs are kept aside:

      * ``materialize(root)`` builds the pair-structured model (for the
        user's finetune_fn and for the final result);
      * ``absorb(ft_model)`` pulls a finetuned pair-model back: updated
        factor weights re-compose into the flat kernels, every other
        parameter is taken verbatim.

    Forward-pass divergence vs the reference (which runs the pair
    ``(x@k1)@k2`` for subsequent layers) is one rounding of the product —
    and the composed kernel is exactly what the acceptance metrics measured.
    """

    def __init__(self) -> None:
        self.pairs: dict[str, nn.Module] = {}
        self.sites: dict[str, engine.Site] = {}
        self.original_sites: dict[str, nn.Module] = {}
        self.composed: dict[str, jax.Array] = {}

    def accept(
        self, root: nn.Module, site: engine.Site, pair: nn.Module
    ) -> nn.Module:
        self.pairs[site.name] = pair
        self.sites[site.name] = site
        self.original_sites[site.name] = nn.get_submodule(root, site.name)
        k1, k2, bias = _pair_kernels(pair, site)
        self.composed[site.name] = _compose_pair(k1, k2)
        root = engine.set_site_kernel2d(root, site, self.composed[site.name])
        if bias is not None:
            root = nn.replace_submodule(root, f"{site.name}.bias", bias)
        return root

    def materialize(self, root: nn.Module) -> nn.Module:
        for name, pair in self.pairs.items():
            root = nn.replace_submodule(root, name, pair)
        return root

    def changed(self, ft_model: nn.Module, name: str) -> bool:
        """Did fine-tuning touch this pair?  Untrained leaves pass through
        nn.combine/optax by identity, so object identity is exact."""
        new = nn.get_submodule(ft_model, name)
        old = self.pairs[name]
        nk1, nk2, nb = _pair_kernels(new, self.sites[name])
        ok1, ok2, ob = _pair_kernels(old, self.sites[name])
        return nk1 is not ok1 or nk2 is not ok2 or nb is not ob

    def absorb(self, ft_model: nn.Module) -> tuple[nn.Module, list[str]]:
        """ft_model has pair structure; return (flat-structure root with all
        of ft_model's parameters, names of pairs fine-tuning changed).
        Unchanged pairs reuse their cached composed kernel — no recompose."""
        root = ft_model
        changed_names = []
        for name, site in self.sites.items():
            was_changed = self.changed(ft_model, name)
            pair = nn.get_submodule(ft_model, name)
            self.pairs[name] = pair
            root = nn.replace_submodule(root, name, self.original_sites[name])
            if was_changed:
                k1, k2, bias = _pair_kernels(pair, site)
                self.composed[name] = _compose_pair(k1, k2)
                changed_names.append(name)
            else:
                bias = _pair_kernels(pair, site)[2]
            root = engine.set_site_kernel2d(root, site, self.composed[name])
            if bias is not None:
                root = nn.replace_submodule(root, f"{name}.bias", bias)
        return root, changed_names


class _Checkpointer:
    """Per-layer resume state for a decomposition run.

    The reference's decomposition is not resumable mid-run (SURVEY.md §5 —
    only the training stages checkpoint via composer/HF Trainer).  Here
    every processed site is recorded to ``progress.jsonl`` and accepted
    factor pairs to per-site safetensors; a restarted run with the same
    ``checkpoint_dir`` replays completed sites instantly and continues."""

    def __init__(
        self, directory: Optional[str], fingerprint: str = ""
    ) -> None:
        self.dir = pathlib.Path(directory) if directory else None
        self.processed: dict[str, Optional[dict[str, Any]]] = {}
        if self.dir is None:
            return
        self.dir.mkdir(parents=True, exist_ok=True)
        fp_file = self.dir / "fingerprint.txt"
        if fp_file.exists():
            recorded = fp_file.read_text().strip()
            if fingerprint and recorded != fingerprint:
                raise ValueError(
                    f"Checkpoint dir {self.dir} was written by a run with "
                    f"different decomposition hyperparameters "
                    f"(fingerprint {recorded!r} != {fingerprint!r}); replaying "
                    "it would silently mix configurations — delete the "
                    "directory or point checkpoint_dir elsewhere"
                )
        elif fingerprint:
            fp_file.write_text(fingerprint)
        progress = self.dir / "progress.jsonl"
        if progress.exists():
            for line in progress.read_text().splitlines():
                rec = json.loads(line)
                self.processed[rec["site"]] = rec.get("config")
            logger.info(
                f"Resuming decomposition: {len(self.processed)} sites already "
                f"processed in {self.dir}"
            )

    def load_pair(
        self, root: nn.Module, name: str
    ) -> tuple[Optional[nn.Module], Any]:
        """Replay a completed site; returns (pair_module|None, config|None)."""
        config_entry = self.processed[name]
        if config_entry is None:
            return None, None
        old = nn.get_submodule(root, name)
        new = utils.build_module_from_config(
            config_entry, dtype=utils.get_default_dtype(old)
        )
        sd = utils.load_state_dict_safetensors(
            str(self.dir / f"{name}.safetensors")
        )
        return utils.load_state_dict(new, sd), config_entry

    def record(
        self,
        pair: Optional[nn.Module],
        name: str,
        config_entry: Optional[dict[str, Any]],
    ) -> None:
        if self.dir is None:
            return
        if config_entry is not None and pair is not None:
            utils.save_state_dict_safetensors(
                utils.state_dict(pair),
                str(self.dir / f"{name}.safetensors"),
            )
        with open(self.dir / "progress.jsonl", "a") as f:
            f.write(json.dumps({"site": name, "config": config_entry}) + "\n")
            f.flush()
            os.fsync(f.fileno())


def decompose(
    *,
    module: nn.Module,
    data_iterator: Iterator[Any],
    loss_fn: LossFn,
    num_data_steps: int,
    metric_iterator: Iterator[Any],
    num_metric_steps: int,
    nsr_final_threshold: float,
    finetune_fn: Optional[FinetuneFn] = None,
    blacklisted_module_names: Optional[list[str]] = None,
    min_rank: int = 32,
    trade_off_factor: float = 0.5,
    reduction_factor: float = 0.5,
    max_accepted_ppl_diff: float = 0.1,
    decompose_in_float64: bool = True,
    precomputing_covariance_num_splits: Optional[int] = None,
    apply_fn: engine.ApplyFn = engine.default_apply,
    checkpoint_dir: Optional[str] = None,
    use_pallas_gram: Optional[bool] = None,
    defer_substitution: bool = True,
    shared_metric_threshold: int = SHARED_METRIC_SITE_THRESHOLD,
    use_indexed_ladder: bool = True,
    eigh_method: str = "exact",
) -> tuple[nn.Module, dict[str, Any]]:
    """Whole-model iterative decomposition.

    Functional analogue of ``ptdeco.dwain.decompose_in_place``
    (/root/reference/src/ptdeco/dwain/decomposition.py:677-800): processes
    decomposeable sites in *reversed* discovery order, runs the geometric
    rank ladder per site, replaces accepted sites with factor pairs, calls
    ``finetune_fn(module, decomposed_names)`` after every accepted layer,
    and returns ``(new_module, decompose_config)`` where the config has the
    reference JSON format with ``__meta__`` per layer.

    ``loss_fn(batch, logits) -> scalar`` mirrors the reference's
    ``loss_fn(input_dict, output)``.
    """
    start_time = time.perf_counter()
    num_params = utils.get_num_params(module)
    current_params = num_params

    modules_to_decompose = engine.get_decomposeable_submodule_names(
        module, blacklisted_module_names
    )
    # drop sites that never fire on a forward (dead modules — e.g. the
    # k/v projections of gemma3n's KV-shared layers): they capture no
    # activations and cannot be calibrated.  The probe batch is pushed
    # back so the calibration stream is unchanged.
    probe_batch = next(data_iterator)
    fired = set(
        engine.fired_site_names(
            module, modules_to_decompose, probe_batch, apply_fn
        )
    )
    data_iterator = itertools.chain([probe_batch], data_iterator)
    for m in modules_to_decompose:
        if m not in fired:
            logger.info(f"Skipping {m}: never fires on a forward pass")
    modules_to_decompose = [m for m in modules_to_decompose if m in fired]
    n = len(modules_to_decompose)
    n_decomposed = 0

    msgs = [f"There are {n} linear modules that can be decomposed:"]
    for i, module_name in enumerate(modules_to_decompose, start=1):
        msgs.append(f"  {i}. {module_name}")
    logger.info("\n".join(msgs))

    decompose_config: dict[str, Any] = {}
    decomposed_submodules: list[str] = []

    fingerprint = json.dumps(
        {
            "nsr": nsr_final_threshold,
            "min_rank": min_rank,
            "trade_off": trade_off_factor,
            "reduction": reduction_factor,
            "max_ppl_diff": max_accepted_ppl_diff,
            "f64": decompose_in_float64,
            "data_steps": num_data_steps,
            "metric_steps": num_metric_steps,
            "sites": modules_to_decompose,
            # these change the eigenbasis / Gram semantics, so resuming
            # across them would silently mix decompositions
            "eigh_method": eigh_method,
            "precompute_splits": precomputing_covariance_num_splits,
        },
        sort_keys=True,
    )
    ckpt = _Checkpointer(checkpoint_dir, fingerprint)
    # resume: don't redo the (expensive) covariance precompute for sites the
    # checkpoint will replay anyway
    pending_sites = [
        m for m in modules_to_decompose if m not in ckpt.processed
    ]

    if (
        precomputing_covariance_num_splits is not None
        and precomputing_covariance_num_splits > 0
        and pending_sites
    ):
        u_dict: Any = _precompute_u_in_splits(
            root=module,
            modules_to_decompose=pending_sites,
            num_splits=precomputing_covariance_num_splits,
            num_data_steps=num_data_steps,
            data_iterator=data_iterator,
            apply_fn=apply_fn,
            decompose_in_float64=decompose_in_float64,
            use_pallas_gram=use_pallas_gram,
            eigh_method=eigh_method,
            reduction_factor=reduction_factor,
        )
    else:
        logger.info("Skipping precomputing covariance matrices")
        u_dict = {}

    metric_fn = _make_metric_fn(loss_fn)
    # Metric-step strategy (all reference-equivalent, engine.py):
    #   * same-shape groups of >=2 sites -> POSITION-INDEXED ladder: one
    #     compile per shape group AND one dispatch per site;
    #   * remaining singletons, few sites -> fused per-site ladder
    #     (1 dispatch/site, site-specific program);
    #   * remaining singletons, many sites -> structure-shared program
    #     (1 compile total, C dispatches per site).
    # Deferred substitution keeps the pytree structure constant so group /
    # shared programs stay valid across the whole walk.
    shared_metric_step = None
    indexed_info: dict[str, tuple[Any, int]] = {}
    if defer_substitution and use_indexed_ladder:
        sites_all = {m: engine.get_site(module, m) for m in modules_to_decompose}
        groups: dict[tuple, list[str]] = {}
        for m in modules_to_decompose:
            groups.setdefault(
                engine.site_group_signature(sites_all[m]), []
            ).append(m)
        for names in groups.values():
            if len(names) >= 2:
                group_sites = tuple(sites_all[m] for m in names)
                step = engine.make_indexed_ladder_metric_step(
                    group_sites, apply_fn, metric_fn
                )
                for j, m in enumerate(names):
                    indexed_info[m] = (step, j)
        if indexed_info:
            n_groups = sum(1 for g in groups.values() if len(g) >= 2)
            logger.info(
                f"Position-indexed ladder: {len(indexed_info)}/{n} sites "
                f"share {n_groups} compiled program(s)"
            )
    if defer_substitution and n - len(indexed_info) > shared_metric_threshold:
        shared_metric_step = engine.make_shared_metric_step(apply_fn, metric_fn)
        logger.info(
            f"Using structure-shared metric step for "
            f"{n - len(indexed_info)} ungrouped sites "
            f"(> {shared_metric_threshold})"
        )
    deferred = _DeferredPairs() if defer_substitution else None

    for i, submodule_name in enumerate(reversed(modules_to_decompose), start=1):
        logger.info(f"PROCESSING {submodule_name} MODULE {i} OUT OF {n}")
        if submodule_name in ckpt.processed:
            pair, config_entry = ckpt.load_pair(module, submodule_name)
            if config_entry is not None and pair is not None:
                site = engine.get_site(module, submodule_name)
                if deferred is not None:
                    module = deferred.accept(module, site, pair)
                else:
                    module = nn.replace_submodule(module, submodule_name, pair)
                decomposed_submodules.append(submodule_name)
                decompose_config[submodule_name] = config_entry
                meta = config_entry.get(utils.MODCONFIG_META_KEY, {})
                current_params -= meta.get("drop_in_params", 0)
                n_decomposed += 1
            logger.info(f"{submodule_name} restored from checkpoint")
            continue
        site = engine.get_site(module, submodule_name)
        result = _process_module(
            root=module,
            site=site,
            data_iterator=data_iterator,
            metric_iterator=metric_iterator,
            metric_fn=metric_fn,
            apply_fn=apply_fn,
            nsr_final_threshold=nsr_final_threshold,
            num_data_steps=num_data_steps,
            num_metric_steps=num_metric_steps,
            num_params=num_params,
            trade_off_factor=trade_off_factor,
            reduction_factor=reduction_factor,
            max_accepted_ppl_diff=max_accepted_ppl_diff,
            min_rank=min_rank,
            decompose_in_float64=decompose_in_float64,
            use_pallas_gram=use_pallas_gram,
            u_matrix=u_dict.pop(submodule_name, None),
            shared_metric_step=shared_metric_step,
            indexed_step_info=indexed_info.get(submodule_name),
            eigh_method=eigh_method,
        )
        current_params -= result["drop_in_params"]
        logger.info(f"CURRENT PARAMS IN M: {current_params / 1e6}")
        new_module = result["decomposed_module"]
        proportion = result["proportion"]

        if new_module is not None:
            decomposed_submodules.append(submodule_name)
            if deferred is not None:
                module = deferred.accept(module, site, new_module)
                if finetune_fn is not None:
                    ft_model = deferred.materialize(module)
                    ft_model = finetune_fn(ft_model, decomposed_submodules)
                    module, ft_changed = deferred.absorb(ft_model)
                    # interleaved FT also retrains EARLIER pairs (the
                    # last-N window); refresh exactly those checkpoints so
                    # a resumed run replays post-finetune weights
                    for prev_name in ft_changed:
                        if prev_name != submodule_name:
                            ckpt.record(
                                deferred.pairs[prev_name],
                                prev_name,
                                decompose_config[prev_name],
                            )
                pair = deferred.pairs[submodule_name]
            else:
                module = nn.replace_submodule(
                    module, submodule_name, new_module
                )
                if finetune_fn is not None:
                    # snapshot leaf identities so only pairs the finetune
                    # actually touched get their checkpoints rewritten
                    # (unconditional rewrites are O(n^2) full-weight IO
                    # over a long walk; mirrors deferred.absorb's
                    # ft_changed filtering)
                    prev_leaves = (
                        {
                            p: jax.tree_util.tree_leaves(
                                nn.get_submodule(module, p)
                            )
                            for p in decomposed_submodules[:-1]
                        }
                        if ckpt.dir is not None
                        else {}
                    )
                    module = finetune_fn(module, decomposed_submodules)
                    if ckpt.dir is not None:
                        for prev_name in decomposed_submodules[:-1]:
                            pair_now = nn.get_submodule(module, prev_name)
                            leaves_now = jax.tree_util.tree_leaves(pair_now)
                            if len(prev_leaves[prev_name]) != len(
                                leaves_now
                            ) or any(
                                a is not b
                                for a, b in zip(
                                    prev_leaves[prev_name], leaves_now
                                )
                            ):
                                ckpt.record(
                                    pair_now,
                                    prev_name,
                                    decompose_config[prev_name],
                                )
                pair = nn.get_submodule(module, submodule_name)
            module_config = utils.get_module_config(pair)
            engine.add_meta_to_module_config(module_config, result)
            decompose_config[submodule_name] = module_config
            ckpt.record(pair, submodule_name, module_config)
            logger.info(f"{submodule_name} decomposed with {proportion=:.4f}")
            n_decomposed += 1
        else:
            ckpt.record(None, submodule_name, None)
            logger.info(f"{submodule_name} not decomposed")

    if isinstance(u_dict, _AsyncUProvider):
        u_dict.shutdown()
    if deferred is not None:
        module = deferred.materialize(module)

    stop_time = time.perf_counter()
    logger.info(f"Decomposed {n_decomposed} out of {n} modules")
    logger.info(f"Decomposition took {stop_time - start_time:.1f} seconds")
    return module, decompose_config
