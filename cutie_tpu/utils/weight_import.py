"""Torch-checkpoint importer: reference .pth state_dict -> cutie_tpu param pytree.

Target-driven: walks OUR param tree and derives the reference state_dict key
for each leaf, applying layout transposes (torch OIHW -> flax HWIO, [out,in]
linears -> [in,out] kernels) and the packed-qkv split of
nn.MultiheadAttention. Includes the single<->multi-object conv surgery
(reference cutie/model/cutie.py:212-256).

Host-side numpy only — no torch dependency at import time (pass a dict of
numpy arrays; use load_torch_checkpoint() if torch is available).
"""
from __future__ import annotations

import logging
from typing import Any, Dict, Tuple

import numpy as np

log = logging.getLogger(__name__)


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth state_dict into numpy (requires torch, CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "network" in sd:  # full training checkpoint
        sd = sd["network"]
    return {k: v.numpy() for k, v in sd.items()}


def _orthogonal(shape, rng: np.random.Generator) -> np.ndarray:
    """numpy equivalent of torch.nn.init.orthogonal_ for a 4D conv pad block."""
    rows = shape[0]
    cols = int(np.prod(shape[1:]))
    a = rng.normal(size=(max(rows, cols), min(rows, cols)))
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diagonal(r))
    q = q.T if rows < cols else q
    return q[:rows, :cols].reshape(shape).astype(np.float32)


def apply_object_surgery(sd: Dict[str, np.ndarray], single_object: bool,
                         sensory_dim: int, value_dim: int,
                         init_as_zero_if_needed: bool = False,
                         seed: int = 0) -> Dict[str, np.ndarray]:
    """Single<->multi-object channel surgery (reference cutie.py:212-256)."""
    sd = dict(sd)
    rng = np.random.default_rng(seed)
    if not single_object:
        k = "mask_encoder.conv1.weight"
        if k in sd and sd[k].shape[1] == 4:
            log.info("Converting %s from single to multiple objects.", k)
            pads = (np.zeros((64, 1, 7, 7), np.float32) if init_as_zero_if_needed
                    else _orthogonal((64, 1, 7, 7), rng))
            sd[k] = np.concatenate([sd[k], pads], axis=1)
        k = "pixel_fuser.sensory_compress.weight"
        if k in sd and sd[k].shape[1] == sensory_dim + 1:
            log.info("Converting %s from single to multiple objects.", k)
            pads = (np.zeros((value_dim, 1, 1, 1), np.float32) if init_as_zero_if_needed
                    else _orthogonal((value_dim, 1, 1, 1), rng))
            sd[k] = np.concatenate([sd[k], pads], axis=1)
    else:
        k = "mask_encoder.conv1.weight"
        if k in sd and sd[k].shape[1] == 5:
            log.warning("Converting %s from multiple objects to single object.", k)
            sd[k] = sd[k][:, :-1]
        # the reference trims BOTH surgery sites (cutie.py:246-254); without
        # this, loading a multi-object .pth in single_object mode fails on
        # the sensory_compress shape
        k = "pixel_fuser.sensory_compress.weight"
        if k in sd and sd[k].shape[1] == sensory_dim + 2:
            log.warning("Converting %s from multiple objects to single object.", k)
            sd[k] = sd[k][:, :-1]
    return sd


def adapt_variables_single_to_multi(variables: Dict[str, Any], sensory_dim: int,
                                    value_dim: int, seed: int = 0) -> Dict[str, Any]:
    """Pytree-level single->multi-object surgery for OUR variable trees
    (cross-stage hand-off; mirrors apply_object_surgery but on HWIO kernels)."""
    import copy

    rng = np.random.default_rng(seed)
    variables = copy.deepcopy(variables)
    p = variables["params"]
    k = p["mask_encoder"]["trunk"]["conv1"]["kernel"]  # [7,7,in,64]
    if k.shape[2] == 4:
        pads = _orthogonal((64, 1, 7, 7), rng).transpose(2, 3, 1, 0)
        p["mask_encoder"]["trunk"]["conv1"]["kernel"] = np.concatenate(
            [np.asarray(k), pads], axis=2)
    k = p["pixel_fuser"]["sensory_compress"]["conv"]["kernel"]  # [1,1,in,Cv]
    if k.shape[2] == sensory_dim + 1:
        pads = _orthogonal((value_dim, 1, 1, 1), rng).transpose(2, 3, 1, 0)
        p["pixel_fuser"]["sensory_compress"]["conv"]["kernel"] = np.concatenate(
            [np.asarray(k), pads], axis=2)
    return variables


def _flat_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flat_paths(v, prefix + (k,))
    else:
        yield prefix, tree


def _set_in(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _torch_key_candidates(path: Tuple[str, ...]) -> Tuple[Tuple[str, ...], str]:
    """Map our param path -> (torch module path segments, torch leaf name)."""
    segs = list(path[:-1])
    leaf = path[-1]

    # structural renames (our tree -> torch naming)
    out = []
    for i, s in enumerate(segs):
        if s == "trunk":
            continue  # trunk is flattened into the encoder module in torch
        if s.startswith("layer") and "_" in s:
            base, idx = s.split("_")
            # PixelEncoder renames layer1 -> res2 (reference big_modules.py:39)
            if base == "layer1" and out and out[0] == "pixel_encoder":
                base = "res2"
            out.extend([base, idx])
        elif s == "downsample_conv":
            out.extend(["downsample", "0"])
        elif s == "downsample_bn":
            out.extend(["downsample", "1"])
        elif s.startswith("block_"):
            out.extend(["blocks", s.rsplit("_", 1)[1]])
        elif s.startswith("mask_pred_"):
            # torch: ModuleList of Sequential(ReLU, GConv2d) -> mask_pred.{i}.1
            out.extend(["mask_pred", s.rsplit("_", 1)[1], "1"])
        elif s.startswith("decoder_feat_proc_"):
            out.extend(["decoder_feat_proc", "transforms", s.rsplit("_", 1)[1]])
        elif s in ("feature_pred_0", "feature_pred_2", "weights_pred_0", "weights_pred_2"):
            a, b = s.rsplit("_", 1)
            out.extend([a, b])
        elif s in ("x_transform", "g_transform"):
            # GroupFeatureFusionBlock keeps its transforms inside the
            # MainToGroupDistributor in torch (group_modules.py:106-111)
            out.extend(["distributor", s])
        else:
            out.append(s)
    return tuple(out), leaf


def convert_torch_state_dict(sd: Dict[str, np.ndarray], variables: Dict[str, Any],
                             strict: bool = True) -> Dict[str, Any]:
    """Build new {params, batch_stats} matching `variables`' structure, filled
    from the torch state_dict `sd`."""
    used = set()
    new_vars: Dict[str, Any] = {"params": {}, "batch_stats": {}}

    def fetch(key):
        if key in sd:
            used.add(key)
            return sd[key]
        return None

    def fetch_with_gconv_fallback(mod_path, param):
        # our GConv2d wraps the conv in a 'conv' submodule that torch doesn't have
        key = ".".join(mod_path + (param,))
        v = fetch(key)
        if v is None and len(mod_path) >= 1 and mod_path[-1] == "conv":
            v = fetch(".".join(mod_path[:-1] + (param,)))
        return v

    missing = []
    for collection in ("params", "batch_stats"):
        if collection not in variables:
            continue
        for path, target in _flat_paths(variables[collection]):
            mod_path, leaf = _torch_key_candidates(path)
            value = None

            if collection == "batch_stats":
                tname = {"mean": "running_mean", "var": "running_var"}[leaf]
                value = fetch(".".join(mod_path + (tname,)))
            if collection == "params":
                # Multihead attention packed qkv
                if len(mod_path) >= 2 and mod_path[-1] in ("q", "k", "v"):
                    which = {"q": 0, "k": 1, "v": 2}[mod_path[-1]]
                    base = mod_path[:-1]
                    if leaf == "kernel":
                        w = fetch(".".join(base + ("in_proj_weight",)))
                        if w is not None:
                            e = w.shape[0] // 3
                            value = w[which * e:(which + 1) * e].T
                    else:
                        b = fetch(".".join(base + ("in_proj_bias",)))
                        if b is not None:
                            e = b.shape[0] // 3
                            value = b[which * e:(which + 1) * e]
                elif leaf == "kernel":
                    w = fetch_with_gconv_fallback(mod_path, "weight")
                    if w is not None:
                        if w.ndim == 4:  # conv OIHW -> HWIO
                            value = np.transpose(w, (2, 3, 1, 0))
                        elif w.ndim == 2:  # linear
                            value = w.T
                        else:
                            value = w
                elif leaf == "scale":  # BN/LN weight
                    value = fetch_with_gconv_fallback(mod_path, "weight")
                elif leaf == "bias":
                    value = fetch_with_gconv_fallback(mod_path, "bias")
                elif leaf == "conv" and target.ndim == 3:
                    # ECA conv1d weight [1,1,k] -> [k,1,1]
                    w = fetch(".".join(mod_path + ("conv", "weight")))
                    if w is not None:
                        value = np.transpose(w, (2, 1, 0))
                elif leaf in ("query_init", "query_emb"):
                    value = fetch(".".join(mod_path + (leaf, "weight")))

            if value is None:
                missing.append((collection, path))
                value = np.asarray(target)
            else:
                if tuple(value.shape) != tuple(target.shape):
                    raise ValueError(
                        f"shape mismatch at {collection}/{'/'.join(path)}: "
                        f"torch {value.shape} vs ours {target.shape}")
            _set_in(new_vars[collection], path, np.asarray(value, dtype=np.float32))

    unused = [k for k in sd if k not in used and "num_batches_tracked" not in k
              and not k.endswith("inv_freq")]  # PE buffers are recomputed here
    for c, p in missing:
        log.info("Param %s/%s not found in checkpoint (kept init).", c, "/".join(p))
    for k in unused:
        log.info("Checkpoint key %s unused.", k)
    if strict and (missing or unused):
        raise ValueError(f"strict import failed: missing={missing[:10]} unused={unused[:10]}")
    return new_vars


def _export_resolve(mod_path: Tuple[str, ...], tname: str, tset) -> str:
    key = ".".join(mod_path + (tname,))
    if (tset is not None and key not in tset and mod_path
            and mod_path[-1] == "conv"):
        # our GConv2d wraps the conv in a 'conv' submodule torch doesn't have
        alt = ".".join(mod_path[:-1] + (tname,))
        if alt in tset:
            return alt
    return key


def export_torch_state_dict(variables: Dict[str, Any],
                            template_keys=None) -> Dict[str, np.ndarray]:
    """Inverse of convert_torch_state_dict: emit a reference-naming torch
    state dict (numpy values) from OUR variable pytree — checkpoint interop
    in the export direction, so models trained here load into the reference
    implementation (cutie/model/cutie.py load_weights naming).

    template_keys: optional iterable of the target torch state_dict's key
    names; used to resolve the GConv 'conv' wrapper naming ambiguity and to
    emit num_batches_tracked zeros. PE inv_freq buffers are NOT emitted
    (deterministic constants recomputed by both sides) — load with
    strict=False or allow-list them."""
    tset = set(template_keys) if template_keys is not None else None
    out: Dict[str, np.ndarray] = {}
    qkv: Dict[str, Dict[Tuple[str, str], np.ndarray]] = {}

    for collection in ("params", "batch_stats"):
        for path, value in _flat_paths(variables.get(collection, {})):
            value = np.asarray(value, np.float32)
            mod_path, leaf = _torch_key_candidates(path)
            if collection == "batch_stats":
                tname = {"mean": "running_mean", "var": "running_var"}[leaf]
                out[_export_resolve(mod_path, tname, tset)] = value
                continue
            if len(mod_path) >= 2 and mod_path[-1] in ("q", "k", "v"):
                base = ".".join(mod_path[:-1])
                qkv.setdefault(base, {})[(mod_path[-1], leaf)] = value
            elif leaf == "kernel":
                if value.ndim == 4:  # HWIO -> OIHW
                    w = np.transpose(value, (3, 2, 0, 1))
                elif value.ndim == 2:
                    w = value.T
                else:
                    w = value
                out[_export_resolve(mod_path, "weight", tset)] = w
            elif leaf == "scale":  # BN/LN weight
                out[_export_resolve(mod_path, "weight", tset)] = value
            elif leaf == "bias":
                out[_export_resolve(mod_path, "bias", tset)] = value
            elif leaf == "conv" and value.ndim == 3:
                # ECA conv1d [k,1,1] -> torch [1,1,k]
                out[".".join(mod_path + ("conv", "weight"))] = np.transpose(
                    value, (2, 1, 0))
            elif leaf in ("query_init", "query_emb"):
                out[".".join(mod_path + (leaf, "weight"))] = value
            else:
                raise ValueError(f"unmapped param {collection}/{'/'.join(path)}")

    for base, parts in qkv.items():
        w = np.concatenate([parts[(x, "kernel")].T for x in ("q", "k", "v")],
                           axis=0)
        out[base + ".in_proj_weight"] = w
        if ("q", "bias") in parts:
            out[base + ".in_proj_bias"] = np.concatenate(
                [parts[(x, "bias")] for x in ("q", "k", "v")], axis=0)

    if tset is not None:
        for k in tset:
            if k.endswith("num_batches_tracked") and k not in out:
                out[k] = np.asarray(0, np.int64)
        extra = [k for k in out if k not in tset]
        missing = [k for k in tset if k not in out
                   and not k.endswith("inv_freq")]
        if extra or missing:
            raise ValueError(f"export does not match template: "
                             f"extra={extra[:10]} missing={missing[:10]}")
    return out
