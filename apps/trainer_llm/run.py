"""CLI entry for the LLM trainer.

Usage: python -m apps.trainer_llm.run --config cfg.yaml --output-path out/

Mirrors /root/reference/examples/trainer_llm/run.py: logging setup, repro
capture (version-stamped config copy + pip freeze), task dispatch.
"""

from __future__ import annotations

import argparse
import logging
import pathlib
import shutil
import subprocess
import sys

import yaml

from ptdeco_tpu import _version

from . import run_decompose_dwain, run_finetune, run_generate

logger = logging.getLogger(__name__)

TRAINER_LLM_VERSION = "0.1.0"


def setup_logging() -> None:
    fmt = (
        "%(asctime)s.%(msecs)03d500: %(levelname).1s "
        "%(name)s.py:%(lineno)d] %(message)s"
    )
    logging.basicConfig(
        level=logging.INFO, format=fmt, datefmt="%m-%d %H:%M:%S"
    )
    for module_name in (
        __name__,
        "ptdeco_tpu",
        "apps.trainer_llm",
    ):
        logging.getLogger(module_name).setLevel(logging.INFO)


def copy_config(
    config_path: pathlib.Path, output_path: pathlib.Path
) -> None:
    """Repro bundle: config with version stamps + pip freeze (reference
    run.py:98-146)."""
    repro = output_path / "repro"
    repro.mkdir(exist_ok=True, parents=True)
    with open(config_path) as f:
        config = yaml.safe_load(f)
    if not isinstance(config, dict):
        raise ValueError(f"Config file is not a YAML mapping: {config_path}")
    config["ptdeco_tpu_version"] = _version.__version__
    config["ptdeco_trainer_llm_version"] = TRAINER_LLM_VERSION
    with open(repro / "config.yaml", "w") as f:
        yaml.dump(config, f)
    try:
        freeze = subprocess.run(
            [sys.executable, "-m", "pip", "freeze"],
            capture_output=True,
            text=True,
            timeout=120,
        ).stdout
        (repro / "requirements_freeze.txt").write_text(freeze)
    except Exception as e:  # offline sandboxes may block pip
        logger.warning(f"pip freeze failed: {e}")


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, type=pathlib.Path)
    parser.add_argument("--output-path", required=True, type=pathlib.Path)
    # multi-host bring-up (jax.distributed; see docs/usage.md "Multi-host").
    # On TPU pods pass --distributed alone (coordinator/process ids are
    # auto-detected from the pod env).
    parser.add_argument("--distributed", action="store_true")
    parser.add_argument("--coordinator-address", default=None)
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    return parser.parse_args()


def main() -> int:
    setup_logging()
    import os

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # the CPU backend can deadlock on a futex at the first real
        # computation under async dispatch (observed as multi-minute
        # stalls right after model build); serialize dispatch for CPU
        # runs.  Env-var gated (not jax.default_backend()) so the
        # check cannot initialize a backend before
        # jax.distributed.initialize in the multi-host path below.
        import jax

        jax.config.update("jax_cpu_enable_async_dispatch", False)
    from ptdeco_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = parse_args()
    if (
        args.distributed
        or args.coordinator_address is not None
        or args.num_processes is not None
        or args.process_id is not None
    ):
        from ptdeco_tpu import parallel

        parallel.initialize_distributed(
            args.coordinator_address, args.num_processes, args.process_id
        )
    args.output_path.mkdir(exist_ok=True, parents=True)
    copy_config(args.config, args.output_path)
    if args.config.resolve() != (
        args.output_path / "config_original.yaml"
    ).resolve():
        shutil.copy(args.config, args.output_path / "config_original.yaml")

    with open(args.config) as f:
        config = yaml.safe_load(f)

    task = config.get("task")
    if task == "decompose_dwain":
        run_decompose_dwain.main(config, args.output_path)
    elif task == "finetune":
        run_finetune.main(config, args.output_path)
    elif task == "generate":
        run_generate.main(config, args.output_path)
    else:
        raise ValueError(f"Unknown task {task!r}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
