"""Continuous batching over a fixed slot pool — production serving for
(decomposed) causal LMs beyond fixed batches.

``serving.generate`` runs one batch lockstep: every prompt enters
together and the program runs ``max_new_tokens`` steps for all rows.  A
serving deployment instead sees a STREAM of requests with different
prompt lengths and budgets; holding short requests hostage to the
longest one wastes the chip.  :class:`ContinuousBatcher` is the
TPU-first version of vLLM-style continuous batching, built entirely out
of the exact cached-forward machinery in ``serving.py``:

* a fixed pool of ``n_slots`` batch rows, each owning one row of a
  static-shape KV cache ``(n_slots, max_len, ...)`` — static shapes are
  non-negotiable under XLA, so "continuous" means slot REUSE, not
  dynamic batch growth;
* admission = a BATCHED prefill per bucket size: every request admitted
  this round whose prompt pads to the same power-of-two bucket runs as
  one fused ``forward_with_cache`` program (prefill is weight-streaming
  -bound, so the batch costs about one row) and the new cache rows
  scatter into their pool slots with one ``.at[slots, :bucket].set``
  per leaf.  A freed slot needs NO clearing — the per-row position mask
  (``serving._valid_keys``) already hides every slot beyond the new
  request's fill;
* decode = ONE jitted program for the whole pool, ``lax.scan`` over
  ``decode_chunk`` steps of the existing ragged per-row-position decode
  (cache slot == token position per row), so scheduling overhead and
  the host-sync floor amortize over the chunk.  Retired/empty rows ride
  along frozen (their writes fall off the one-hot scatter once their
  position passes ``max_len``) — the SPMD-friendly alternative to
  shrinking the batch;
* the host loop only ever moves ``(n_slots,)``-sized token vectors, and
  every device computation is shape-stable: after warmup the engine
  runs two compiled programs (one decode chunk + one prefill per bucket
  size) regardless of traffic.

Per-request exactness: each pool row's attention is masked to its own
tokens, so a request's greedy continuation is IDENTICAL to running
``serving.generate`` on that prompt alone (pinned by test against the
per-row oracle).  Works unchanged on dwain/falor/lockd-decomposed and
int8-quantized models — the cached forward underneath is the same.

Refused: models with recurrent (SSM/linear-attention) layers — a
recurrent state has no slot == position rewrite, so ragged per-row
decode (and therefore slot reuse) is unsound; use uniform-length
``serving.generate`` batches for those.

No reference analogue: the reference serves nothing (its deployment
story ends at lm_eval loglikelihood scoring,
/root/reference/examples/trainer_llm/metrics.py:81-107).
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .serving import (
    KVCache,
    _has_ssm,
    _sample,
    check_decode_supported,
    forward_with_cache,
    init_cache,
)

__all__ = ["ContinuousBatcher", "FinishedRequest"]


@dataclasses.dataclass(frozen=True)
class FinishedRequest:
    """One completed request: generated ids (eos included if hit) and
    why it stopped ('eos' or 'length')."""

    req_id: int
    tokens: np.ndarray  # (n_generated,) int32
    finish_reason: str


@dataclasses.dataclass
class _Slot:
    req_id: int
    budget: int  # max_new_tokens for this request
    generated: list  # python ints accumulated so far
    done: bool = False


@functools.partial(
    jax.jit, static_argnames=("bucket", "greedy", "use_top_p", "top_k",
                              "use_min_p"),
    donate_argnames=("caches",),
)
def _prefill_impl(
    lm: Any,
    rows: jax.Array,  # (n_slots, bucket) right-padded int32
    lens: jax.Array,  # (n_slots,) int32 (1 for inactive pad rows)
    slots: jax.Array,  # (n_slots,) int32 target pool row; n_slots = drop
    caches: KVCache,  # pool caches (n_slots, max_len, ...)
    key: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
    min_p: jax.Array,
    *,
    bucket: int,
    greedy: bool,
    use_top_p: bool,
    top_k: Optional[int],
    use_min_p: bool,
) -> tuple[KVCache, jax.Array]:
    """Prefill a whole ADMISSION BATCH (every request of one bucket size
    admitted this round, padded to n_slots rows) as ONE program: cached
    forward on a fresh bucket-length cache, first token per row from its
    last REAL position, then one scatter of the new rows into the pool
    (inactive pad rows carry slot id n_slots and drop out of bounds).
    Prefill is weight-streaming-bound, so batching admissions costs ~one
    single-row prefill while saving a dispatch + host sync per request —
    the dominant engine overhead on a high-latency transport.  Only the
    first ``bucket`` cache positions are written; the slot tail keeps
    stale values, which the per-row position mask makes causally
    invisible (the same argument that lets freed slots skip clearing)."""
    k = rows.shape[0]
    fresh = jax.tree.map(
        lambda c: jnp.zeros((k, bucket) + c.shape[2:], c.dtype), caches
    )
    logits, fresh = forward_with_cache(
        lm, rows, fresh, 0, last_pos=lens - 1
    )
    toks = _sample(
        logits[:, 0, :], greedy, temperature, key,
        top_p if use_top_p else None, top_k, min_p if use_min_p else None,
    )
    caches = jax.tree.map(
        lambda pool, new: pool.at[slots, :bucket].set(new, mode="drop"),
        caches,
        fresh,
    )
    return caches, toks


@functools.partial(
    jax.jit, static_argnames=("chunk", "greedy", "eos_id", "use_top_p",
                              "top_k", "use_min_p"),
    donate_argnames=("caches",),
)
def _decode_chunk_impl(
    lm: Any,
    caches: KVCache,
    pos: jax.Array,  # (n_slots,) int32 per-row cache position
    tok: jax.Array,  # (n_slots,) int32 last token per row
    frozen: jax.Array,  # (n_slots,) bool: inactive or already-finished
    key: jax.Array,
    temperature: jax.Array,
    top_p: jax.Array,
    min_p: jax.Array,
    *,
    chunk: int,
    greedy: bool,
    eos_id: Optional[int],
    use_top_p: bool,
    top_k: Optional[int],
    use_min_p: bool,
) -> tuple[KVCache, jax.Array, jax.Array, jax.Array, jax.Array]:
    """``chunk`` ragged decode steps over the whole pool as one program.
    Frozen rows keep feeding their last token but never advance their
    cache position (so nothing is written: slot state is preserved for
    retirement bookkeeping and reuse).  Rows that hit ``eos_id``
    mid-chunk freeze exactly like ``serving.generate``'s eos fill."""

    def step(carry, step_key):
        caches, pos, tok, frozen = carry
        logits, caches = forward_with_cache(lm, tok[:, None], caches, pos)
        nxt = _sample(
            logits[:, -1, :], greedy, temperature, step_key,
            top_p if use_top_p else None, top_k,
            min_p if use_min_p else None,
        )
        nxt = jnp.where(frozen, tok, nxt)
        pos = jnp.where(frozen, pos, pos + 1)
        if eos_id is not None:
            frozen = frozen | (nxt == eos_id)
        return (caches, pos, nxt, frozen), nxt

    (caches, pos, tok, frozen), toks = lax.scan(
        step, (caches, pos, tok, frozen), jax.random.split(key, chunk)
    )
    return caches, pos, tok, frozen, toks.T  # (n_slots, chunk)


class ContinuousBatcher:
    """Slot-pool continuous batching engine (see module docstring).

    Parameters
    ----------
    lm: the (possibly decomposed / int8-quantized) causal LM.
    n_slots: pool size — the decode batch, fixed for the engine's life.
    max_len: cache length per slot; every request must satisfy
        ``prompt_len + max_new_tokens <= max_len``.
    eos_id: stop token (optional).
    temperature/top_p/top_k/min_p: sampling knobs, engine-wide
        (``serving.generate`` semantics; 0 temperature = greedy).
    decode_chunk: decode steps per host round-trip.  A finished request
        retires at the end of its chunk, so up to ``decode_chunk - 1``
        steps of pool work are wasted past an eos — amortize the ~5ms
        dispatch floor against that waste for the deployment's typical
        generation length.
    prefill_buckets: ascending prompt-padding sizes; defaults to powers
        of two up to ``max_len``.  One prefill program compiles per
        bucket actually used.
    """

    def __init__(
        self,
        lm: Any,
        n_slots: int,
        max_len: int,
        *,
        eos_id: Optional[int] = None,
        temperature: float = 0.0,
        top_p: Optional[float] = None,
        top_k: Optional[int] = None,
        min_p: Optional[float] = None,
        key: Optional[jax.Array] = None,
        decode_chunk: int = 8,
        prefill_buckets: Optional[tuple] = None,
    ) -> None:
        check_decode_supported(lm)
        if _has_ssm(lm):
            raise ValueError(
                "continuous batching requires ragged per-row decode, "
                "which recurrent (SSM/linear-attention) layers do not "
                "support — use uniform-length serving.generate batches"
            )
        if n_slots < 1:
            raise ValueError(f"n_slots must be >= 1, got {n_slots}")
        if decode_chunk < 1:
            raise ValueError(
                f"decode_chunk must be >= 1, got {decode_chunk}"
            )
        if temperature < 0.0:
            raise ValueError(f"temperature must be >= 0, got {temperature}")
        if top_p is not None and not 0.0 < top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {top_p}")
        if top_k is not None and top_k < 1:
            raise ValueError(f"top_k must be >= 1, got {top_k}")
        if min_p is not None and not 0.0 <= min_p <= 1.0:
            raise ValueError(f"min_p must be in [0, 1], got {min_p}")
        self._lm = lm
        self._n_slots = n_slots
        self._max_len = max_len
        self._eos_id = eos_id
        self._chunk = int(decode_chunk)
        if prefill_buckets is None:
            buckets = []
            b = 16
            while b < max_len:
                buckets.append(b)
                b *= 2
            buckets.append(max_len)
            prefill_buckets = tuple(buckets)
        self._buckets = tuple(sorted(set(int(b) for b in prefill_buckets)))
        if self._buckets[-1] > max_len:
            raise ValueError(
                f"prefill bucket {self._buckets[-1]} exceeds max_len "
                f"{max_len}"
            )
        self._sampling = dict(
            greedy=temperature == 0.0,
            use_top_p=top_p is not None,
            top_k=None if top_k is None else int(top_k),
            use_min_p=min_p is not None,
        )
        self._temperature = jnp.float32(temperature)
        self._top_p = jnp.float32(1.0 if top_p is None else top_p)
        self._min_p = jnp.float32(0.0 if min_p is None else min_p)
        self._key = key if key is not None else jax.random.PRNGKey(0)
        # device state: only the cache pool lives on device between
        # calls.  pos/tok are HOST numpy — on a high-latency transport
        # every extra device round-trip is the dominant cost, so the
        # engine syncs exactly once per step() (admission first-tokens +
        # chunk tokens fetched in single batched device_gets).
        self._caches = init_cache(lm, n_slots, max_len)
        self._pos = np.zeros((n_slots,), np.int32)
        self._tok = np.zeros((n_slots,), np.int32)
        # host state
        self._slots: list[Optional[_Slot]] = [None] * n_slots
        self._queue: list[tuple[int, np.ndarray, int]] = []
        self._finished: list[FinishedRequest] = []
        self._ids = itertools.count()

    # ------------------------------------------------------------------
    @property
    def has_work(self) -> bool:
        return bool(self._queue) or any(
            s is not None for s in self._slots
        )

    @property
    def n_active(self) -> int:
        return sum(s is not None for s in self._slots)

    def submit(
        self,
        prompt_ids: Any,
        max_new_tokens: int,
        req_id: Optional[int] = None,
    ) -> int:
        """Queue one request (1-D int32 prompt).  Returns its id."""
        prompt = np.asarray(prompt_ids, np.int32).reshape(-1)
        if prompt.size < 1:
            raise ValueError("empty prompt")
        if max_new_tokens < 1:
            raise ValueError(
                f"max_new_tokens must be >= 1, got {max_new_tokens}"
            )
        if prompt.size + max_new_tokens > self._max_len:
            raise ValueError(
                f"prompt {prompt.size} + max_new_tokens {max_new_tokens} "
                f"exceeds max_len {self._max_len}"
            )
        if prompt.size > self._buckets[-1]:
            # Fail at submission time: _bucket_for would otherwise raise
            # inside run()/step() AFTER the request was popped from the
            # queue, surfacing mid-stream with the request silently lost.
            raise ValueError(
                f"prompt length {prompt.size} exceeds largest prefill "
                f"bucket {self._buckets[-1]}"
            )
        if req_id is None:
            rid = next(self._ids)
        else:
            rid = req_id
            live = {s.req_id for s in self._slots if s is not None}
            queued = {q[0] for q in self._queue}
            if rid in live or rid in queued:
                raise ValueError(
                    f"req_id {rid} duplicates a live/queued request"
                )
            # Keep auto-generated ids from colliding with this one later.
            if isinstance(rid, int):
                self._ids = itertools.count(
                    max(rid + 1, next(self._ids))
                )
        self._queue.append((rid, prompt, int(max_new_tokens)))
        return rid

    # ------------------------------------------------------------------
    def _next_key(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def _bucket_for(self, n: int) -> int:
        for b in self._buckets:
            if b >= n:
                return b
        raise ValueError(
            f"prompt length {n} exceeds largest bucket {self._buckets[-1]}"
        )

    def _admit(self) -> None:
        """Prefill queued requests into free slots: admissions are
        grouped by bucket size and each group runs as ONE fused batched
        prefill program (compiled once per bucket); first tokens of all
        groups are then fetched in one batched device_get.  Per-request
        programs + per-request host syncs would dominate engine time on
        a high-latency transport."""
        by_bucket: dict[int, list[tuple[int, np.ndarray]]] = {}
        for i in range(self._n_slots):
            if self._slots[i] is not None or not self._queue:
                continue
            rid, prompt, budget = self._queue.pop(0)
            bucket = self._bucket_for(prompt.size)
            by_bucket.setdefault(bucket, []).append((i, prompt))
            self._pos[i] = prompt.size
            self._slots[i] = _Slot(req_id=rid, budget=budget, generated=[])
        if not by_bucket:
            return
        pending: list[tuple[list[int], jax.Array]] = []
        for bucket, group in by_bucket.items():
            rows = np.zeros((self._n_slots, bucket), np.int32)
            lens = np.ones((self._n_slots,), np.int32)
            slots = np.full((self._n_slots,), self._n_slots, np.int32)
            for r, (i, prompt) in enumerate(group):
                rows[r, : prompt.size] = prompt
                lens[r] = prompt.size
                slots[r] = i
            self._caches, toks = _prefill_impl(
                self._lm,
                jnp.asarray(rows),
                jnp.asarray(lens),
                jnp.asarray(slots),
                self._caches,
                self._next_key(),
                self._temperature,
                self._top_p,
                self._min_p,
                bucket=bucket,
                **self._sampling,
            )
            pending.append(([i for i, _ in group], toks))
        firsts = jax.device_get([t for _, t in pending])
        for (slot_ids, _), toks_np in zip(pending, firsts):
            for r, i in enumerate(slot_ids):
                first = int(toks_np[r])
                self._tok[i] = first
                s = self._slots[i]
                s.generated.append(first)
                if self._eos_id is not None and first == self._eos_id:
                    s.done = True
                self._maybe_retire(i)

    def _maybe_retire(self, i: int) -> None:
        s = self._slots[i]
        if s is None:
            return
        if s.done or len(s.generated) >= s.budget:
            self._finished.append(
                FinishedRequest(
                    req_id=s.req_id,
                    tokens=np.asarray(s.generated, np.int32),
                    finish_reason="eos" if s.done else "length",
                )
            )
            self._slots[i] = None

    def step(self) -> list[FinishedRequest]:
        """Admit waiting requests, run one decode chunk over the pool,
        and return the requests that finished this round."""
        self._admit()
        if all(s is None for s in self._slots):
            out, self._finished = self._finished, []
            return out
        frozen = jnp.asarray(
            [s is None or s.done for s in self._slots], bool
        )
        self._caches, pos, tok, _, toks = _decode_chunk_impl(
            self._lm,
            self._caches,
            jnp.asarray(self._pos),
            jnp.asarray(self._tok),
            frozen,
            self._next_key(),
            self._temperature,
            self._top_p,
            self._min_p,
            chunk=self._chunk,
            eos_id=self._eos_id,
            **self._sampling,
        )
        # the one host sync per chunk: pos/tok/tokens in a single fetch
        # (np.array copies: device_get buffers are read-only and _admit
        # writes per-slot entries in place)
        self._pos, self._tok, toks_np = (
            np.array(a) for a in jax.device_get((pos, tok, toks))
        )
        for i, s in enumerate(self._slots):
            if s is None or s.done:
                continue
            for t in toks_np[i]:
                if len(s.generated) >= s.budget:
                    break
                s.generated.append(int(t))
                if self._eos_id is not None and t == self._eos_id:
                    s.done = True
                    break
            self._maybe_retire(i)
        out, self._finished = self._finished, []
        return out

    def run(self) -> list[FinishedRequest]:
        """Drive ``step`` until every queued request has finished."""
        done: list[FinishedRequest] = []
        while self.has_work:
            done.extend(self.step())
        return done
