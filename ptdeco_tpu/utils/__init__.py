from .common import (
    get_default_dtype,
    resolve_subdir,
    get_device_memory_gb,
    get_num_params,
    get_type_name,
    is_compound_module,
    split_module_parent_child_name,
    prefetch_to_device,
    to_device,
)
from .losses_primitives import (
    calc_kl_divergence,
    calc_kl_loss,
    calc_per_channel_noise_to_signal_ratio,
)
from .modconfig import (
    MODCONFIG_META_KEY,
    apply_decompose_config,
    build_module_from_config,
    get_module_config,
)
from .statedict import (
    load_state_dict,
    load_state_dict_pt,
    load_state_dict_safetensors,
    save_state_dict_pt,
    save_state_dict_safetensors,
    state_dict,
)
from . import modconfig  # noqa: F401
from . import profiling  # noqa: F401
from . import train_ckpt  # noqa: F401

__all__ = [
    "get_default_dtype",
    "resolve_subdir",
    "get_device_memory_gb",
    "get_num_params",
    "get_type_name",
    "is_compound_module",
    "split_module_parent_child_name",
    "prefetch_to_device",
    "to_device",
    "calc_kl_divergence",
    "calc_kl_loss",
    "calc_per_channel_noise_to_signal_ratio",
    "MODCONFIG_META_KEY",
    "apply_decompose_config",
    "build_module_from_config",
    "get_module_config",
    "load_state_dict",
    "load_state_dict_pt",
    "load_state_dict_safetensors",
    "save_state_dict_pt",
    "save_state_dict_safetensors",
    "state_dict",
]
