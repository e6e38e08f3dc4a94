"""PyTorch -> JAX weight conversion for released reference checkpoints.

Two converters:
  * ``convert_maskdit``: reference EDMPrecond state_dicts (the released
    ``imagenet256-*.pt`` / ``imagenet512-*.pt`` files' 'ema'/'model'
    entries, reference train.py:259-268) -> our EDMPrecond param tree.
  * ``convert_vae``: the released ``autoencoder_kl.pth`` state dict
    (reference autoencoder.py:466-479) -> our AutoencoderKL param tree.

Layout rules (see models/layers.py docstring):
  Linear  w (out, in)        -> kernel (in, out)        [transpose]
  Conv2d  w (O, I, kh, kw)   -> kernel (kh, kw, I, O)   [permute 2,3,1,0]
  GroupNorm/LayerNorm weight -> scale
  pos_embed buffers are skipped (recomputed bit-identically; validated in
  tests/test_layers.py::test_sincos_pos_embed_analytic).
"""

from __future__ import annotations

import re
from typing import Any, Mapping, Optional

import jax
import numpy as np


def _t(w) -> np.ndarray:
    return np.asarray(w, dtype=np.float32)


def _linear(tree: dict, path: list[str], w, b=None) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = {"kernel": _t(w).T}
    if b is not None:
        node[path[-1]]["bias"] = _t(b)


def _set(tree: dict, path: list[str], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def load_torch_state_dict(path: str, key: str | None = None) -> dict:
    """Load a torch checkpoint file on CPU and return a numpy state dict.

    ``key`` selects a sub-dict (e.g. 'ema' / 'model' in reference training
    checkpoints); None for flat state dicts like autoencoder_kl.pth.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if key is not None:
        ckpt = ckpt[key]
    out = {}
    for k, v in ckpt.items():
        k = k.replace("_orig_mod.", "")  # torch.compile prefix (helper.py:55)
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


# ---------------------------------------------------------------------------
# MaskDiT / EDMPrecond
# ---------------------------------------------------------------------------

def convert_maskdit(state: Mapping[str, np.ndarray]) -> dict:
    """Reference EDMPrecond state_dict -> flax param tree for our EDMPrecond.

    Unknown keys raise so silent drops can't produce a wrong-FID model.
    """
    params: dict[str, Any] = {"model": {}}
    m = params["model"]
    skipped = []

    def block_dest(prefix: str, idx: int) -> list[str]:
        return [f"{prefix}_{idx}"]

    for key, w in state.items():
        if not key.startswith("model."):
            skipped.append(key)
            continue
        k = key[len("model."):]

        if k in ("pos_embed", "decoder_pos_embed"):
            continue  # recomputed
        if k == "x_embedder.proj.weight":
            _set(m, ["x_embedder", "kernel"], _t(w).transpose(2, 3, 1, 0))
        elif k == "x_embedder.proj.bias":
            _set(m, ["x_embedder", "bias"], _t(w))
        elif k == "t_embedder.mlp.0.weight":
            _set(m, ["t_embedder", "fc1", "kernel"], _t(w).T)
        elif k == "t_embedder.mlp.0.bias":
            _set(m, ["t_embedder", "fc1", "bias"], _t(w))
        elif k == "t_embedder.mlp.2.weight":
            _set(m, ["t_embedder", "fc2", "kernel"], _t(w).T)
        elif k == "t_embedder.mlp.2.bias":
            _set(m, ["t_embedder", "fc2", "bias"], _t(w))
        elif k == "y_embedder.embedding_table.weight":
            _set(m, ["y_embedder", "embedding_table", "kernel"], _t(w).T)
        elif k in ("cls_token", "mask_token"):
            _set(m, [k], _t(w))
        elif k.startswith("feat_embedder."):
            part = k.split(".")[-1]
            _set(m, ["feat_embedder", "kernel" if part == "weight" else "bias"],
                 _t(w).T if part == "weight" else _t(w))
        elif k.startswith(("cls_token_embedder.", "enc_feat_embedder.")):
            mod, part = k.split(".")
            _set(m, [mod, "kernel" if part == "weight" else "bias"],
                 _t(w).T if part == "weight" else _t(w))
        else:
            bm = re.match(
                r"(blocks|decoder_blocks)\.(\d+)\.(.+)\.(weight|bias)$", k
            )
            if bm:
                group, idx, sub, part = bm.groups()
                dest = [f"{group}_{idx}"]
                submap = {
                    "attn.qkv": ["attn", "qkv"],
                    "attn.proj": ["attn", "proj"],
                    "mlp.fc1": ["mlp", "fc1"],
                    "mlp.fc2": ["mlp", "fc2"],
                    "adaLN_modulation.1": ["adaLN_modulation"],
                }
                if sub not in submap:
                    raise KeyError(f"unhandled block sub-module '{sub}' in '{key}'")
                leaf = "kernel" if part == "weight" else "bias"
                val = _t(w).T if part == "weight" else _t(w)
                _set(m, dest + submap[sub] + [leaf], val)
                continue
            lm = re.match(
                r"(final_layer|decoder_layer)\.(adaLN_modulation\.1|linear)"
                r"\.(weight|bias)$", k
            )
            if lm:
                layer, sub, part = lm.groups()
                sub = "adaLN_modulation" if sub.startswith("adaLN") else "linear"
                leaf = "kernel" if part == "weight" else "bias"
                val = _t(w).T if part == "weight" else _t(w)
                _set(m, [layer, sub, leaf], val)
                continue
            raise KeyError(f"unhandled reference checkpoint key '{key}'")

    if skipped:
        allowed = all(s.split(".")[0] in ("feat_norm",) for s in skipped)
        if not allowed:
            raise KeyError(f"unhandled non-model keys: {skipped}")
    return params


def export_maskdit(params: Mapping, pos_embeds: Optional[Mapping] = None) -> dict:
    """Our EDMPrecond param tree -> reference torch state-dict naming.

    Inverse of convert_maskdit; lets checkpoints trained here be consumed
    by the reference PyTorch code (weights as numpy arrays; pass through
    torch.from_numpy before torch.save). pos_embeds, if given, supplies
    the {'pos_embed', 'decoder_pos_embed'} buffers the torch model expects
    in its state dict (values are deterministic sin-cos tables).
    """
    state: dict[str, np.ndarray] = {}
    m = params["model"]

    def lin(key: str, node: Mapping) -> None:
        state[key + ".weight"] = np.asarray(node["kernel"]).T
        if "bias" in node:
            state[key + ".bias"] = np.asarray(node["bias"])

    state["model.x_embedder.proj.weight"] = np.asarray(
        m["x_embedder"]["kernel"]
    ).transpose(3, 2, 0, 1)
    state["model.x_embedder.proj.bias"] = np.asarray(m["x_embedder"]["bias"])
    lin("model.t_embedder.mlp.0", m["t_embedder"]["fc1"])
    lin("model.t_embedder.mlp.2", m["t_embedder"]["fc2"])
    if "y_embedder" in m:
        state["model.y_embedder.embedding_table.weight"] = np.asarray(
            m["y_embedder"]["embedding_table"]["kernel"]
        ).T
    for group in ("blocks", "decoder_blocks"):
        i = 0
        while f"{group}_{i}" in m:
            b = m[f"{group}_{i}"]
            lin(f"model.{group}.{i}.attn.qkv", b["attn"]["qkv"])
            lin(f"model.{group}.{i}.attn.proj", b["attn"]["proj"])
            lin(f"model.{group}.{i}.mlp.fc1", b["mlp"]["fc1"])
            lin(f"model.{group}.{i}.mlp.fc2", b["mlp"]["fc2"])
            lin(f"model.{group}.{i}.adaLN_modulation.1", b["adaLN_modulation"])
            i += 1
    for layer in ("decoder_layer", "final_layer"):
        if layer in m:
            lin(f"model.{layer}.adaLN_modulation.1", m[layer]["adaLN_modulation"])
            lin(f"model.{layer}.linear", m[layer]["linear"])
    for tok in ("mask_token", "cls_token"):
        if tok in m:
            state[f"model.{tok}"] = np.asarray(m[tok])
    if pos_embeds:
        for k, v in pos_embeds.items():
            state[f"model.{k}"] = np.asarray(v)
    return state


def stack_scan_blocks(params: dict) -> dict:
    """Unrolled block layout -> scan layout.

    blocks_0..blocks_{n-1} subtrees become one 'blocks/scan/block' subtree
    whose leaves carry a leading (depth,) axis (models/dit.ScannedBlocks).
    """
    out: dict[str, Any] = {}
    m = params["model"]
    groups: dict[str, list] = {"blocks": [], "decoder_blocks": []}
    new_m: dict[str, Any] = {}
    for key, val in m.items():
        matched = False
        for g in groups:
            mm = re.fullmatch(rf"{g}_(\d+)", key)
            if mm:
                groups[g].append((int(mm.group(1)), val))
                matched = True
                break
        if not matched:
            new_m[key] = val
    for g, items in groups.items():
        if not items:
            continue
        items.sort()
        trees = [t for _, t in items]
        stacked = jax.tree.map(lambda *leaves: np.stack(leaves), *trees)
        new_m[g] = {"scan": {"block": stacked}}
    out = dict(params)
    out["model"] = new_m
    return out


def unstack_scan_blocks(params: dict) -> dict:
    """Inverse of stack_scan_blocks."""
    new_m: dict[str, Any] = {}
    for key, val in params["model"].items():
        if key in ("blocks", "decoder_blocks") and isinstance(val, dict) \
                and "scan" in val:
            stacked = val["scan"]["block"]
            depth = jax.tree.leaves(stacked)[0].shape[0]
            for i in range(depth):
                new_m[f"{key}_{i}"] = jax.tree.map(
                    lambda x, i=i: np.asarray(x)[i], stacked
                )
        else:
            new_m[key] = val
    out = dict(params)
    out["model"] = new_m
    return out


# ---------------------------------------------------------------------------
# SD-VAE
# ---------------------------------------------------------------------------

def convert_vae(state: Mapping[str, np.ndarray]) -> dict:
    """autoencoder_kl.pth state dict -> flax param tree for AutoencoderKL."""
    params: dict[str, Any] = {}

    def conv(path: list[str], w, b) -> None:
        _set(params, path + ["conv", "kernel"], _t(w).transpose(2, 3, 1, 0))
        _set(params, path + ["conv", "bias"], _t(b))

    def norm(path: list[str], w, b) -> None:
        _set(params, path + ["scale"], _t(w))
        _set(params, path + ["bias"], _t(b))

    pairs: dict[str, np.ndarray] = dict(state)

    def take(key: str) -> tuple[np.ndarray, np.ndarray]:
        return pairs.pop(f"{key}.weight"), pairs.pop(f"{key}.bias")

    for side in ("encoder", "decoder"):
        conv([side, "conv_in"], *take(f"{side}.conv_in"))
        conv([side, "conv_out"], *take(f"{side}.conv_out"))
        norm([side, "norm_out"], *take(f"{side}.norm_out"))
        for mid in ("block_1", "block_2"):
            _convert_resblock(
                params, pairs, f"{side}.mid.{mid}", [side, f"mid_{mid}"], conv, norm
            )
        for part in ("norm", "q", "k", "v", "proj_out"):
            w, b = take(f"{side}.mid.attn_1.{part}")
            if part == "norm":
                norm([side, "mid_attn_1", "norm"], w, b)
            else:
                conv([side, "mid_attn_1", part], w, b)

    # encoder down / decoder up stacks (levels 0..3, blocks per ddconfig)
    i = 0
    while f"encoder.down.{i}.block.0.norm1.weight" in pairs:
        j = 0
        while f"encoder.down.{i}.block.{j}.norm1.weight" in pairs:
            _convert_resblock(
                params, pairs, f"encoder.down.{i}.block.{j}",
                ["encoder", f"down_{i}_block_{j}"], conv, norm,
            )
            j += 1
        if f"encoder.down.{i}.downsample.conv.weight" in pairs:
            conv(["encoder", f"down_{i}_downsample", "conv"],
                 *take(f"encoder.down.{i}.downsample.conv"))
        i += 1

    i = 0
    while f"decoder.up.{i}.block.0.norm1.weight" in pairs:
        j = 0
        while f"decoder.up.{i}.block.{j}.norm1.weight" in pairs:
            _convert_resblock(
                params, pairs, f"decoder.up.{i}.block.{j}",
                ["decoder", f"up_{i}_block_{j}"], conv, norm,
            )
            j += 1
        if f"decoder.up.{i}.upsample.conv.weight" in pairs:
            conv(["decoder", f"up_{i}_upsample", "conv"],
                 *take(f"decoder.up.{i}.upsample.conv"))
        i += 1

    conv(["quant_conv"], *take("quant_conv"))
    conv(["post_quant_conv"], *take("post_quant_conv"))

    if pairs:
        raise KeyError(f"unhandled VAE keys: {sorted(pairs)[:8]} ...")
    return params


def export_vae(params: Mapping) -> dict[str, np.ndarray]:
    """Our AutoencoderKL param tree -> reference torch state-dict naming.

    Inverse of convert_vae (autoencoder_kl.pth layout). Mainly used to
    fabricate format-correct VAE checkpoints for pipeline tests and to
    round-trip-validate the import mapping.
    """
    state: dict[str, np.ndarray] = {}

    def walk(node: Mapping, flax_path: list[str]) -> None:
        for k, v in node.items():
            if isinstance(v, Mapping) and "kernel" in v:  # a Conv wrapper leaf
                torch_key = _flax_vae_path_to_torch(flax_path + [k])
                state[torch_key + ".weight"] = np.asarray(
                    v["kernel"]
                ).transpose(3, 2, 0, 1)
                state[torch_key + ".bias"] = np.asarray(v["bias"])
            elif isinstance(v, Mapping) and "scale" in v:  # GroupNorm leaf
                torch_key = _flax_vae_path_to_torch(flax_path + [k])
                state[torch_key + ".weight"] = np.asarray(v["scale"])
                state[torch_key + ".bias"] = np.asarray(v["bias"])
            elif isinstance(v, Mapping):
                walk(v, flax_path + [k])

    walk(params, [])
    return state


def _flax_vae_path_to_torch(path: list[str]) -> str:
    """encoder/down_0_block_1/conv1/conv -> encoder.down.0.block.1.conv1"""
    parts: list[str] = []
    for p in path:
        if p == "conv" and parts:  # inner nn.Conv of our Conv wrapper
            continue
        m = re.fullmatch(r"(down|up)_(\d+)_(block)_(\d+)", p)
        if m:
            parts += [m.group(1), m.group(2), m.group(3), m.group(4)]
            continue
        m = re.fullmatch(r"(down|up)_(\d+)_(downsample|upsample)", p)
        if m:
            parts += [m.group(1), m.group(2), m.group(3), "conv"]
            continue
        m = re.fullmatch(r"mid_(block_1|block_2|attn_1)", p)
        if m:
            parts += ["mid", m.group(1)]
            continue
        parts.append(p)
    return ".".join(parts)


def _convert_resblock(params, pairs, src: str, dest: list[str], conv, norm) -> None:
    for part in ("norm1", "conv1", "norm2", "conv2"):
        w = pairs.pop(f"{src}.{part}.weight")
        b = pairs.pop(f"{src}.{part}.bias")
        (norm if part.startswith("norm") else conv)(dest + [part], w, b)
    for sc in ("nin_shortcut", "conv_shortcut"):
        if f"{src}.{sc}.weight" in pairs:
            conv(dest + ["nin_shortcut"],
                 pairs.pop(f"{src}.{sc}.weight"), pairs.pop(f"{src}.{sc}.bias"))
