"""Every shipped example config must validate against its pydantic schema.
(The reference ships decompose_dwain_swinv2_tiny.yaml with stale keys that
fail its own extra='forbid' validation — SURVEY.md §2.3; this test prevents
that class of rot here.)"""

import pathlib

import pytest
import yaml

REPO = pathlib.Path(__file__).resolve().parent.parent


def _configs(app: str):
    return sorted((REPO / "apps" / app / "examples_config").glob("*.yaml"))


@pytest.mark.parametrize("path", _configs("trainer_llm"), ids=lambda p: p.name)
def test_llm_example_configs_validate(path):
    from apps.trainer_llm import configurator

    cfg = yaml.safe_load(path.read_text())
    schema = {
        "decompose_dwain": configurator.DecomposeDWAINConfig,
        "finetune": configurator.FinetuneConfig,
        "generate": configurator.GenerateConfig,
    }[cfg["task"]]
    schema(**cfg)


@pytest.mark.parametrize("path", _configs("trainer_vision"), ids=lambda p: p.name)
def test_vision_example_configs_validate(path):
    from apps.trainer_vision import configurator

    cfg = yaml.safe_load(path.read_text())
    schema = {
        "decompose_lockd": configurator.DecomposeLOCKDConfig,
        "decompose_falor": configurator.DecomposeFALORConfig,
        "decompose_dwain": configurator.DecomposeDWAINConfig,
        "finetune": configurator.FinetuneConfig,
    }[cfg["task"]]
    schema(**cfg)


def test_swinv2_config_blacklist_names_exist():
    """The swinv2 example config's blacklisted module names must exist on
    the zoo model it targets (the reference's swinv2 config rotted exactly
    this way)."""
    import jax

    from apps.trainer_vision import builder

    path = (
        REPO / "apps/trainer_vision/examples_config/decompose_dwain_swinv2_tiny.yaml"
    )
    cfg = yaml.safe_load(path.read_text())
    model = builder.make_model(cfg["decompose_model_name"], num_classes=10)
    builder.validate_module_names(model, cfg["blacklisted_modules"])
