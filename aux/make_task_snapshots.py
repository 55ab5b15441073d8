"""Export EleutherAI lm_eval multiple-choice task data into the offline
snapshot format consumed by apps/trainer_llm (eval_harness.py rows:
``{"query": ..., "choices": [...], "gold": N}``).

Run on a machine WITH lm_eval + network access:

    python aux/make_task_snapshots.py hellaswag arc_easy piqa \
        --out apps/trainer_llm/tasks --limit 500

then check the resulting ``<task>.jsonl`` files into
apps/trainer_llm/tasks/ — named tasks evaluate offline from then on
(apps/trainer_llm/metrics.py:calc_lm_eval_metrics resolution order).

This sandbox has no network and no lm_eval, so the script is tooling for
users; tests exercise the snapshot RESOLUTION path with the bundled
synthetic task (apps/trainer_llm/tasks/synthetic_copy.jsonl).
"""

import argparse
import json
import pathlib


def export_task(task_name: str, out_dir: pathlib.Path, limit: int) -> None:
    from lm_eval import tasks as lm_tasks

    task = lm_tasks.get_task_dict([task_name])[task_name]
    docs = task.validation_docs() if task.has_validation_docs() else task.test_docs()
    rows = []
    for i, doc in enumerate(docs):
        if i >= limit:
            break
        # multiple-choice tasks expose these via the unified interface
        rows.append(
            {
                "query": task.doc_to_text(doc),
                "choices": [str(c) for c in doc["choices"]]
                if "choices" in doc
                else task.doc_to_choice(doc),
                "gold": int(doc.get("gold", doc.get("label", 0))),
            }
        )
    out = out_dir / f"{task_name}.jsonl"
    with open(out, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"wrote {len(rows)} rows to {out}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("tasks", nargs="+")
    p.add_argument(
        "--out",
        default=str(
            pathlib.Path(__file__).resolve().parent.parent
            / "apps"
            / "trainer_llm"
            / "tasks"
        ),
    )
    p.add_argument("--limit", type=int, default=500)
    args = p.parse_args()
    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    for t in args.tasks:
        export_task(t, out_dir, args.limit)


if __name__ == "__main__":
    main()
