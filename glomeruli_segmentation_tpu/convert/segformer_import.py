"""Import HuggingFace SegFormer checkpoints into the Flax model.

Maps ``SegformerForSemanticSegmentation`` state-dict keys (as produced by
the reference's training flow, ``module/SegFormer/train/train.py:211-245``)
onto :class:`..models.segformer.Segformer` variables.  Accepts either a
``pytorch_model.bin`` (read by our torch-free pickle loader) or an
in-memory state dict of numpy arrays.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Mapping

import numpy as np

from .torch_pickle import load_torch_pickle


def _set(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = np.asarray(value)


def _conv(w):  # (O, I, kh, kw) -> (kh, kw, I, O)
    return np.transpose(w, (2, 3, 1, 0))


def _dense(w):  # (out, in) -> (in, out)
    return np.transpose(w, (1, 0))


def _dwconv(w):  # (C, 1, kh, kw) -> (kh, kw, 1, C)
    return np.transpose(w, (2, 3, 1, 0))


def hf_state_dict_to_variables(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def ln(dst, key_w, key_b):
        _set(params, dst + ("scale",), sd[key_w])
        _set(params, dst + ("bias",), sd[key_b])

    n_stages = 1 + max(
        int(m.group(1)) for k in sd
        if (m := re.match(r"segformer\.encoder\.patch_embeddings\.(\d+)\.", k)))
    for i in range(n_stages):
        base = f"segformer.encoder.patch_embeddings.{i}."
        dst = ("encoder", f"patch_embed{i}")
        _set(params, dst + ("proj", "kernel"), _conv(sd[base + "proj.weight"]))
        _set(params, dst + ("proj", "bias"), sd[base + "proj.bias"])
        ln(dst + ("norm",), base + "layer_norm.weight",
           base + "layer_norm.bias")
        ln(("encoder", f"norm{i}"),
           f"segformer.encoder.layer_norm.{i}.weight",
           f"segformer.encoder.layer_norm.{i}.bias")

        j = 0
        while f"segformer.encoder.block.{i}.{j}.layer_norm_1.weight" in sd:
            b = f"segformer.encoder.block.{i}.{j}."
            d = ("encoder", f"block{i}_{j}")
            ln(d + ("norm1",), b + "layer_norm_1.weight",
               b + "layer_norm_1.bias")
            ln(d + ("norm2",), b + "layer_norm_2.weight",
               b + "layer_norm_2.bias")
            for hf, ours in (("query", "q"), ("key", "k"), ("value", "v")):
                _set(params, d + ("attn", ours, "kernel"),
                     _dense(sd[b + f"attention.self.{hf}.weight"]))
                _set(params, d + ("attn", ours, "bias"),
                     sd[b + f"attention.self.{hf}.bias"])
            if b + "attention.self.sr.weight" in sd:
                _set(params, d + ("attn", "sr", "kernel"),
                     _conv(sd[b + "attention.self.sr.weight"]))
                _set(params, d + ("attn", "sr", "bias"),
                     sd[b + "attention.self.sr.bias"])
                ln(d + ("attn", "sr_norm"),
                   b + "attention.self.layer_norm.weight",
                   b + "attention.self.layer_norm.bias")
            _set(params, d + ("attn", "proj", "kernel"),
                 _dense(sd[b + "attention.output.dense.weight"]))
            _set(params, d + ("attn", "proj", "bias"),
                 sd[b + "attention.output.dense.bias"])
            _set(params, d + ("mlp", "dense1", "kernel"),
                 _dense(sd[b + "mlp.dense1.weight"]))
            _set(params, d + ("mlp", "dense1", "bias"),
                 sd[b + "mlp.dense1.bias"])
            _set(params, d + ("mlp", "dwconv", "kernel"),
                 _dwconv(sd[b + "mlp.dwconv.dwconv.weight"]))
            _set(params, d + ("mlp", "dwconv", "bias"),
                 sd[b + "mlp.dwconv.dwconv.bias"])
            _set(params, d + ("mlp", "dense2", "kernel"),
                 _dense(sd[b + "mlp.dense2.weight"]))
            _set(params, d + ("mlp", "dense2", "bias"),
                 sd[b + "mlp.dense2.bias"])
            j += 1

    # decode head — absent from backbone-only checkpoints (the published
    # nvidia/mit-b0 is a SegformerForImageClassification export whose
    # decode head HF randomly initializes on from_pretrained, which is
    # exactly the reference's transfer-learning recipe,
    # SegFormer/train/train.py:140-141,211-212); the trainer fills missing
    # subtrees from its own init
    if "decode_head.linear_fuse.weight" in sd:
        for i in range(n_stages):
            base = f"decode_head.linear_c.{i}.proj."
            _set(params, ("head", f"linear_c{i}", "kernel"),
                 _dense(sd[base + "weight"]))
            _set(params, ("head", f"linear_c{i}", "bias"), sd[base + "bias"])
        _set(params, ("head", "linear_fuse", "kernel"),
             _conv(sd["decode_head.linear_fuse.weight"]))
        _set(params, ("head", "bn", "scale"),
             sd["decode_head.batch_norm.weight"])
        _set(params, ("head", "bn", "bias"),
             sd["decode_head.batch_norm.bias"])
        _set(stats, ("head", "bn", "mean"),
             sd["decode_head.batch_norm.running_mean"])
        _set(stats, ("head", "bn", "var"),
             sd["decode_head.batch_norm.running_var"])
        _set(params, ("head", "classifier", "kernel"),
             _conv(sd["decode_head.classifier.weight"]))
        _set(params, ("head", "classifier", "bias"),
             sd["decode_head.classifier.bias"])
    return {"params": params, "batch_stats": stats}


def load_segformer_variables(checkpoint_path: str) -> Dict[str, Any]:
    """Load from an HF checkpoint directory or a ``pytorch_model.bin`` /
    ``model.safetensors`` file."""
    path = checkpoint_path
    if os.path.isdir(path):
        for name in ("pytorch_model.bin", "model.safetensors"):
            candidate = os.path.join(path, name)
            if os.path.isfile(candidate):
                path = candidate
                break
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        sd = load_torch_pickle(path)
        sd = {k: np.asarray(v) for k, v in sd.items()}
    return hf_state_dict_to_variables(sd)
