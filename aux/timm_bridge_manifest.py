"""Emit the timm-bridge name-map + shape manifest (VERDICT r3 #7).

For each supported timm vision target (efficientformerv2_s0/s1) this
prints a JSON manifest mapping every NATIVE torch-layout checkpoint key
to its expected timm spelling (primary + accepted alternates) and shape.
timm is absent from this offline image, so the mapping encodes the
upstream naming conventions; in a timm-bearing environment, diff this
manifest against ``timm.create_model(name).state_dict()`` to verify or
repair the translator (models/efficientformer.py::
translate_timm_efficientformerv2_state_dict) in minutes, then run
``pytest tests/test_timm_bridge.py`` for the logits pin.

Usage:  python aux/timm_bridge_manifest.py [out.json]
"""

import json
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_enable_async_dispatch", False)

from ptdeco_tpu import models, utils  # noqa: E402


def expected_timm_keys(native_key: str) -> list[str]:
    """Inverse of translate_timm_efficientformerv2_state_dict: the timm
    spellings that map onto this native key (primary first)."""
    k = native_key
    outs = []
    if k.startswith("stem0."):
        outs.append("stem.conv1." + k[len("stem0."):])
    elif k.startswith("stem1."):
        outs.append("stem.conv2." + k[len("stem1."):])
    elif re.search(r"downsample\.(conv|bn)\.", k):
        outs.append(
            re.sub(r"downsample\.(conv|bn)\.", r"downsample.conv.\1.", k)
        )
    elif re.search(r"\.ls([12])$", k):
        outs.append(re.sub(r"\.ls([12])$", r".ls\1.gamma", k))
        outs.append(re.sub(r"\.ls([12])$", r".layer_scale_\1", k))
    elif re.search(r"token_mixer\.proj\.(conv|bn)\.", k):
        outs.append(
            re.sub(r"token_mixer\.proj\.(conv|bn)\.",
                   r"token_mixer.proj.1.\1.", k)
        )
    if not outs:
        outs.append(k)  # identity (q/k/v ConvNorm, heads, norm, biases)
    return outs


def expected_timm_keys_cr(native_key: str) -> list[str]:
    """Inverse of translate_timm_swinv2_cr_state_dict."""
    k = native_key
    k = k.replace("patch_embed.", "patch_embed.proj.")
    k = k.replace("patch_norm.", "patch_embed.norm.")
    m = re.match(r"stages\.(\d+)\.downsample\.(.*)$", k)
    if m:
        k = f"stages.{int(m.group(1)) + 1}.downsample.{m.group(2)}"
    k = k.replace(".attn.cpb_fc1.", ".attn.meta_mlp.fc1.")
    k = k.replace(".attn.cpb_fc2.", ".attn.meta_mlp.fc2.")
    if k.startswith("head."):
        k = "head.fc." + k[len("head."):]
    return [k]


def manifest_for(name: str, factory, key_fn=expected_timm_keys) -> dict:
    model = factory(jax.random.PRNGKey(0), image_size=224)
    sd = utils.state_dict(model)
    entries = {}
    for k in sorted(sd):
        if k.endswith("num_batches_tracked"):
            continue
        entries[k] = {
            "shape": list(sd[k].shape),
            "timm_keys": key_fn(k),
        }
    return {
        "model": name,
        "n_keys": len(entries),
        "note": (
            "native torch-layout key -> expected timm spelling(s); "
            "derived offline, verify against a live timm state_dict"
        ),
        "keys": entries,
    }


def main() -> None:
    out = {
        "efficientformerv2_s0": manifest_for(
            "efficientformerv2_s0", models.efficientformerv2_s0
        ),
        "efficientformerv2_s1": manifest_for(
            "efficientformerv2_s1", models.efficientformerv2_s1
        ),
        "swinv2_cr_tiny_ns_224": manifest_for(
            "swinv2_cr_tiny_ns_224",
            models.swinv2_cr_tiny_ns,
            key_fn=expected_timm_keys_cr,
        ),
    }
    text = json.dumps(out, indent=1)
    if len(sys.argv) > 1:
        pathlib.Path(sys.argv[1]).write_text(text + "\n")
        print(f"wrote {sys.argv[1]}")
    else:
        print(text)


if __name__ == "__main__":
    main()
