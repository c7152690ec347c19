"""RITM torch-checkpoint importer (HRNet+OCR interactive model).

Target-driven like cutie_tpu.utils.weight_import: walks our param tree and
derives the reference state_dict key(s) for each leaf. The reference wraps
norm layers in nested Sequentials in several places, so some segments map to
multiple candidate keys tried in order.
"""
from __future__ import annotations

import logging
import re
from typing import Any, Dict, List, Tuple

import numpy as np

log = logging.getLogger(__name__)


def _candidates(path: Tuple[str, ...]) -> List[Tuple[str, str]]:
    """our param path -> list of (torch module path, torch param name)."""
    segs = list(path[:-1])
    leaf = path[-1]

    # leaf param name + whether this is a batch-stats leaf
    if leaf == "kernel":
        pname = "weight"
    elif leaf == "scale":
        pname = "weight"
    elif leaf == "bias":
        pname = "bias"
    elif leaf in ("mean", "var"):
        pname = {"mean": "running_mean", "var": "running_var"}[leaf]
    elif leaf == "maps_transform_3_scale":
        return [("maps_transform.3", "scale")]
    else:
        pname = leaf

    out_options: List[List[str]] = [[]]

    def extend_all(*variants: List[str]):
        nonlocal out_options
        out_options = [o + v for o in out_options for v in variants]

    for s in segs:
        if s in ("bb", "hd"):  # backbone/head wrapper modules (flax-only split)
            continue
        m = re.fullmatch(r"(stage\d)_(\d+)", s)
        if m:
            extend_all([m.group(1), m.group(2)])
            continue
        m = re.fullmatch(r"branches_(\d+)_(\d+)", s)
        if m:
            extend_all(["branches", m.group(1), m.group(2)])
            continue
        m = re.fullmatch(r"(layer\d)_(\d+)", s)
        if m:
            extend_all([m.group(1), m.group(2)])
            continue
        if s == "downsample_conv":
            extend_all(["downsample", "0"])
            continue
        if s == "downsample_bn":
            extend_all(["downsample", "1"])
            continue
        m = re.fullmatch(r"fuse_(\d+)_(\d+)_(\d+)_(conv|bn)", s)
        if m:
            i, j, k, kind = m.groups()
            extend_all(["fuse_layers", i, j, k, "0" if kind == "conv" else "1"])
            continue
        m = re.fullmatch(r"fuse_(\d+)_(\d+)_(conv|bn)", s)
        if m:
            i, j, kind = m.groups()
            extend_all(["fuse_layers", i, j, "0" if kind == "conv" else "1"])
            continue
        m = re.fullmatch(r"(transition\d)_(\d+)_(\d+)_(conv|bn)", s)
        if m:
            t, i, j, kind = m.groups()
            idx = "0" if kind == "conv" else "1"
            # new-branch case: Sequential of Sequential(conv,bn,relu)
            # existing-branch case: Sequential(conv,bn,relu) directly (j == 0)
            extend_all([t, i, j, idx], [t, i, idx])
            continue
        m = re.fullmatch(r"(f_pixel|f_object|f_down|f_up)_(\d+)_(conv|bn)", s)
        if m:
            name, k, kind = m.groups()
            k = int(k)
            if kind == "conv":
                extend_all([name, str(2 * k)])
            else:  # bn wrapped in Sequential(norm, relu) at odd indices
                extend_all([name, str(2 * k + 1), "0"])
            continue
        # ---- DeepLabV3+ flavor (cutie_tpu/ritm/deeplab.py) ----
        m = re.fullmatch(r"conv1_(\d+)", s)
        if m:  # deep stem Sequential
            extend_all(["conv1", m.group(1)])
            continue
        if s == "skip_project_0_conv":
            extend_all(["skip_project", "skip_project", "0"])
            continue
        if s == "skip_project_0_bn":
            extend_all(["skip_project", "skip_project", "1"])
            continue
        m = re.fullmatch(r"b([0-3])_0_(conv|bn)", s)
        if m:  # ASPP branches
            extend_all(["concurent", m.group(1),
                        "0" if m.group(2) == "conv" else "1"])
            continue
        m = re.fullmatch(r"b4_gap_(conv|bn)", s)
        if m:  # ASPP global pooling branch (gap: pool=0, conv=1, bn=2)
            extend_all(["concurent", "4", "gap",
                        "1" if m.group(1) == "conv" else "2"])
            continue
        m = re.fullmatch(r"project_0_(conv|bn)", s)
        if m:
            extend_all(["project", "0" if m.group(1) == "conv" else "1"])
            continue
        m = re.fullmatch(r"head_([01])", s)
        if m:  # _DeepLabHead separable convs; inner dw/pw/bn handled below
            extend_all(["head", "block", m.group(1), "body"])
            continue
        if s == "head_2":
            extend_all(["head", "block", "2"])
            continue
        m = re.fullmatch(r"sep_head_([01])", s)
        if m:  # SepConvHead separable convs (torch names them 'layers')
            extend_all(["head", "layers", m.group(1), "body"])
            continue
        if s == "sep_head_2":
            extend_all(["head", "layers", "2"])
            continue
        if s in ("dw", "pw"):
            extend_all(["0" if s == "dw" else "1"])
            continue
        if s == "bn" and out_options and out_options[0] and \
                out_options[0][-1] == "body":
            extend_all(["2"])
            continue
        m = re.fullmatch(r"(conv_bn_dropout|aux_head|conv3x3_ocr|cls_head|rgb_conv"
                         r"|maps_transform)_(\d+)_?(conv|bn)?", s)
        if m:
            name, k, kind = m.groups()
            if kind == "bn":
                # conv_bn_dropout's norm is wrapped; aux/cls/ocr heads are flat
                extend_all([name, str(int(k) + 1), "0"], [name, str(int(k) + 1)])
            else:
                extend_all([name, k])
            continue
        out_options = [o + [s] for o in out_options]

    return [(".".join(o), pname) for o in out_options]


def convert_ritm_state_dict(sd: Dict[str, np.ndarray], variables: Dict[str, Any],
                            strict: bool = True) -> Dict[str, Any]:
    used = set()
    new_vars: Dict[str, Any] = {"params": {}, "batch_stats": {}}
    missing = []

    def set_in(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    def flat(tree, prefix=()):
        if isinstance(tree, dict):
            for k, v in tree.items():
                yield from flat(v, prefix + (k,))
        else:
            yield prefix, tree

    for collection in ("params", "batch_stats"):
        if collection not in variables:
            continue
        for path, target in flat(variables[collection]):
            value = None
            for mod, pname in _candidates(path):
                key = f"{mod}.{pname}"
                if key in sd:
                    value = sd[key]
                    used.add(key)
                    break
            if value is None:
                missing.append((collection, path))
                value = np.asarray(target)
            else:
                if value.ndim == 4:  # conv OIHW -> HWIO
                    value = np.transpose(value, (2, 3, 1, 0))
                elif value.ndim == 2:
                    value = value.T
                if tuple(value.shape) != tuple(np.asarray(target).shape):
                    raise ValueError(f"shape mismatch {path}: torch "
                                     f"{value.shape} vs {np.asarray(target).shape}")
            set_in(new_vars[collection], path, np.asarray(value, np.float32))

    unused = [k for k in sd if k not in used and "num_batches_tracked" not in k]
    for c, p in missing:
        log.info("RITM param %s/%s missing in checkpoint.", c, "/".join(p))
    for k in unused:
        log.info("RITM checkpoint key %s unused.", k)
    if strict and (missing or unused):
        raise ValueError(
            f"strict RITM import failed: missing={missing[:8]} unused={unused[:8]}")
    return new_vars


def load_ritm_raw(path: str):
    """torch.load a RITM .pth, preferring the safe weights_only mode.

    RITM checkpoints store tensors + a JSON config string, which
    weights_only=True can handle; only fall back to full unpickling (which
    executes arbitrary code from untrusted files) for exotic checkpoints,
    with a warning."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:  # noqa: BLE001 — legacy pickled checkpoints
        log.warning("%s is not weights_only-loadable; falling back to full "
                    "unpickling — only do this for trusted files.", path)
        return torch.load(path, map_location="cpu", weights_only=False)


def load_ritm_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a RITM .pth state dict (tensors only)."""
    sd = load_ritm_raw(path)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
