"""LLM calibration/eval data pipelines.

Re-implements the reference's two loaders
(/root/reference/examples/trainer_llm/datasets_hf.py) against numpy batches:

  * ``prepare_dataloader_v1`` — sample-then-concatenate to fixed max_seqlen;
    used for perplexity / train / test (reference :122-204).
  * ``prepare_dataloader_v2`` — greedy token-buffer packing with separator
    tokens; used for decomposition calibration (reference :207-279).

Design difference: the reference detours through detokenize/re-tokenize per
packed chunk (decode then re-encode); we pack token ids directly — same
content, one tokenizer pass (and the packing hot loop can be delegated to
the native C++ packer in ptdeco_tpu/data when available).

Batches are dicts of numpy arrays {"input_ids", "attention_mask", "labels"}
— the convention the decomposition engine and ce_loss expect.
"""

from __future__ import annotations

import logging
from typing import Any, Iterator, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_DS_PROPERTIES: dict[str, dict[str, Any]] = {
    "wikitext2": {"path": "wikitext", "config_name": "wikitext-2-raw-v1"},
    "alpaca": {"path": "tatsu-lab/alpaca", "data_column": "text"},
}


def _is_json_fname(fname: str) -> bool:
    return fname.endswith((".json", ".json.gz", ".jsonl", ".jsonl.gz"))


def get_dataset(dataset_and_split_name: str) -> list[str]:
    """Returns the raw text list for 'name.split' or a JSON file path
    (reference :33-101).  Requires `datasets` + network/cache for HF names."""
    import datasets

    if _is_json_fname(dataset_and_split_name):
        ds = datasets.load_dataset("json", data_files=dataset_and_split_name)
        return [t for t in ds["train"]["text"] if t]

    dataset_name, split_name = dataset_and_split_name.split(".")
    if dataset_name not in _DS_PROPERTIES:
        raise ValueError(
            f"Unknown dataset {dataset_name}, available: {set(_DS_PROPERTIES)}"
        )
    props = _DS_PROPERTIES[dataset_name]
    ds = datasets.load_dataset(props["path"], name=props.get("config_name"))
    if dataset_name == "alpaca":
        if split_name == "full":
            split_name = "train"
        else:
            ds = ds["train"].train_test_split(test_size=0.2, seed=42)
            temp = ds.pop("test").train_test_split(test_size=0.5, seed=42)
            ds["test"] = temp["train"]
            ds["validation"] = temp["test"]
    col = props.get("data_column", "text")
    return [t for t in ds[split_name][col] if t]


def normalize_separator(separator: str, tokenizer: Any) -> str:
    allowed = {"\n\n", " ", "", "eos"}
    if separator not in allowed:
        raise ValueError(f"{separator=} not in {allowed=}")
    if separator == "eos":
        return tokenizer.eos_token
    return separator


class BatchIterator:
    """Infinite shuffling iterator over fixed-size numpy batch dicts."""

    def __init__(
        self,
        sequences: np.ndarray,  # (n, max_seqlen) int32
        masks: np.ndarray,
        batch_size: int,
        seed: int = 42,
        loop: bool = True,
    ) -> None:
        self.sequences = sequences
        self.masks = masks
        self.batch_size = batch_size
        self.rng = np.random.RandomState(seed)
        self.loop = loop
        if batch_size > len(sequences):
            raise ValueError(
                f"batch_size {batch_size} > {len(sequences)} available "
                "sequences — raise nsamples or lower batch_size"
            )
        self._order = self.rng.permutation(len(sequences))
        self._pos = 0

    def __len__(self) -> int:
        return len(self.sequences) // self.batch_size

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        return self

    def __next__(self) -> dict[str, np.ndarray]:
        if self._pos + self.batch_size > len(self._order):
            if not self.loop:
                raise StopIteration
            self._order = self.rng.permutation(len(self.sequences))
            self._pos = 0
        idx = self._order[self._pos : self._pos + self.batch_size]
        self._pos += self.batch_size
        ids = self.sequences[idx]
        mask = self.masks[idx]
        return {
            "input_ids": ids,
            "attention_mask": mask,
            "labels": ids.copy(),
        }

    def one_epoch(
        self, shuffle: bool = False
    ) -> Iterator[dict[str, np.ndarray]]:
        """Deterministic order by default (evals); ``shuffle=True`` draws a
        fresh permutation per call — training epochs must not replay the
        identical batch sequence (HF Trainer shuffles per epoch)."""
        if shuffle:
            order = self.rng.permutation(len(self.sequences))
        else:
            order = np.arange(len(self.sequences))
        for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
            idx = order[i : i + self.batch_size]
            yield {
                "input_ids": self.sequences[idx],
                "attention_mask": self.masks[idx],
                "labels": self.sequences[idx].copy(),
            }


def prepare_dataloader_v1(
    *,
    dataset: Sequence[str],
    tokenizer: Any,
    separator: str,
    max_seqlen: int = 2048,
    batch_size: int = 1,
    nsamples: int = 128,
    seed: int = 42,
) -> BatchIterator:
    """Sample-then-concatenate loader (reference :122-204): draw random
    starting texts, concatenate with the separator until max_seqlen tokens,
    truncate.  Static shapes (padded to max_seqlen) — TPU-friendly."""
    separator = normalize_separator(separator, tokenizer)
    texts = [t for t in dataset if len(t) > 0]
    rng = np.random.RandomState(seed)
    sep_ids = tokenizer(separator, add_special_tokens=False)["input_ids"]

    indices = list(range(len(texts)))
    rows = []
    while len(rows) < nsamples and indices:
        start = int(rng.randint(0, len(indices)))
        idx = start
        toks: list[int] = []
        while len(toks) < max_seqlen and idx < len(indices):
            ids = tokenizer(texts[indices[idx]], add_special_tokens=False)[
                "input_ids"
            ]
            toks += (sep_ids if toks else []) + ids
            idx += 1
        indices = indices[:start] + indices[idx:]
        if len(toks) >= max_seqlen:
            rows.append(toks[:max_seqlen])
    logger.info(f"v1 dataloader - created dataset of size {len(rows)}")
    seqs = np.asarray(rows, np.int32)
    masks = np.ones_like(seqs)
    return BatchIterator(seqs, masks, batch_size, seed)


def prepare_dataloader_v2(
    *,
    dataset: Sequence[str],
    tokenizer: Any,
    max_seqlen: int = 2048,
    batch_size: int = 1,
    seed: int = 42,
    separator: str,
) -> BatchIterator:
    """Greedy token-buffer packing (reference :207-279): tokenize texts in
    order, join with separator tokens, cut into max_seqlen chunks."""
    separator = normalize_separator(separator, tokenizer)
    sep_ids = tokenizer(separator, add_special_tokens=False)["input_ids"]
    texts = [t for t in dataset if len(t) > 0]

    try:
        from ptdeco_tpu.data import native_packer

        token_lists = [
            tokenizer(t, add_special_tokens=False)["input_ids"] for t in texts
        ]
        rows = native_packer.pack_greedy(token_lists, sep_ids, max_seqlen)
    except Exception:
        rows = []
        buffer: list[int] = []
        idx = 0
        while idx < len(texts) - 1:
            while len(buffer) <= max_seqlen and idx < len(texts) - 1:
                ids = tokenizer(texts[idx], add_special_tokens=False)["input_ids"]
                buffer += ids + list(sep_ids)
                idx += 1
            rows.append(buffer[:max_seqlen])
            buffer = []
        rows = [r for r in rows if len(r) == max_seqlen]

    logger.info(f"v2 dataloader - created dataset of size {len(rows)}")
    if len(rows) == 0:
        raise ValueError(
            "v2 packing produced no full-length rows — the dataset is too "
            "small for max_seqlen (note: like the reference, the last "
            "document and any final partial chunk are not emitted)"
        )
    seqs = np.asarray(rows, np.int32)
    masks = np.ones_like(seqs)
    return BatchIterator(seqs, masks, batch_size, seed)


def make_synthetic_loader(
    vocab_size: int,
    max_seqlen: int,
    batch_size: int,
    nsamples: int = 64,
    seed: int = 0,
) -> BatchIterator:
    """Offline fallback: uniform random token sequences (testing/benching)."""
    rng = np.random.RandomState(seed)
    seqs = rng.randint(0, vocab_size, (nsamples, max_seqlen)).astype(np.int32)
    masks = np.ones_like(seqs)
    return BatchIterator(seqs, masks, batch_size, seed)
