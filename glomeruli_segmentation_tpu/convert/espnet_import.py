"""Import reference ESPNet ``.pth`` checkpoints into the Flax model.

Maps the torch state-dict keys of the reference architecture
(``module/espnet/train/Model.py`` — key inventory verified against the five
shipped ``models/espnet_fold*.pth`` files, see SURVEY.md §2.1) onto the
parameter tree of :class:`glomeruli_segmentation_tpu.models.espnet.ESPNet`.

Layout transforms:
- Conv2d ``(O, I, kH, kW)``          -> HWIO ``(kH, kW, I, O)``
- ConvTranspose2d ``(I, O, 2, 2)``   -> ``(2, 2, I, O)`` (for ``upconv2x2``)
- BatchNorm weight/bias              -> scale/bias (params)
- BatchNorm running_mean/var         -> mean/var (batch_stats)
- PReLU weight                       -> alpha
"""
from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

from .torch_pickle import load_torch_pickle


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _convT(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 0, 1))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = np.asarray(value)


_BN_PARAM = {"weight": "scale", "bias": "bias"}
_BN_STAT = {"running_mean": "mean", "running_var": "var"}

# torch module-path prefix -> flax module path, for encoder-scope keys
_ENC_RENAMES = [
    (re.compile(r"^level1\."), ("level1",), "cbr"),
    (re.compile(r"^b1\."), ("b1",), "br"),
    (re.compile(r"^level2_0\."), ("down2",), "esp_down"),
    (re.compile(r"^level2\.(\d+)\."), ("level2_{i}",), "esp_block"),
    (re.compile(r"^b2\."), ("b2",), "br"),
    (re.compile(r"^level3_0\."), ("down3",), "esp_down"),
    (re.compile(r"^level3\.(\d+)\."), ("level3_{i}",), "esp_block"),
    (re.compile(r"^b3\."), ("b3",), "br"),
    (re.compile(r"^classifier\."), ("classifier",), "conv_c"),
]


def _import_bn(params, stats, base: Tuple[str, ...], leaf: str, value):
    if leaf in _BN_PARAM:
        _set(params, base + (_BN_PARAM[leaf],), value)
    elif leaf in _BN_STAT:
        _set(stats, base + (_BN_STAT[leaf],), value)
    elif leaf == "num_batches_tracked":
        pass
    else:
        raise KeyError(f"unknown BN leaf {leaf} at {base}")


def _import_encoder_key(params, stats, key: str, value, prefix: Tuple[str, ...]):
    for pattern, path_tmpl, kind in _ENC_RENAMES:
        m = pattern.match(key)
        if not m:
            continue
        path = tuple(
            p.format(i=m.group(1)) if "{i}" in p else p for p in path_tmpl
        )
        rest = key[m.end():]
        full = prefix + path
        if kind == "cbr":
            _import_cbr(params, stats, full, rest, value)
        elif kind == "br":
            _import_br(params, stats, full, rest, value)
        elif kind == "conv_c":
            assert rest == "conv.weight", rest
            _set(params, full + ("conv", "kernel"), _conv(value))
        elif kind in ("esp_down", "esp_block"):
            _import_esp(params, stats, full, rest, value, downsample=kind == "esp_down")
        return
    raise KeyError(f"unmapped encoder key: {key}")


def _import_cbr(params, stats, base, rest: str, value):
    if rest == "conv.weight":
        _set(params, base + ("c", "conv", "kernel"), _conv(value))
    elif rest.startswith("bn."):
        _import_bn(params, stats, base + ("norm", "bn"), rest[3:], value)
    elif rest == "act.weight":
        _set(params, base + ("act", "alpha"), value)
    else:
        raise KeyError(f"unknown CBR leaf {rest} at {base}")


def _import_br(params, stats, base, rest: str, value):
    if rest.startswith("bn."):
        _import_bn(params, stats, base + ("norm", "bn"), rest[3:], value)
    elif rest == "act.weight":
        _set(params, base + ("act", "alpha"), value)
    else:
        raise KeyError(f"unknown BR leaf {rest} at {base}")


def _import_esp(params, stats, base, rest: str, value, downsample: bool):
    m = re.match(r"^(c1|d1|d2|d4|d8|d16)\.conv\.weight$", rest)
    if m:
        _set(params, base + (m.group(1), "conv", "kernel"), _conv(value))
        return
    if downsample:
        if rest.startswith("bn."):
            _import_bn(params, stats, base + ("norm", "bn"), rest[3:], value)
            return
        if rest == "act.weight":
            _set(params, base + ("act", "alpha"), value)
            return
    else:
        # ESP residual block wraps its BN+PReLU in a BR child called "bn"
        if rest.startswith("bn.bn."):
            _import_bn(params, stats, base + ("br", "norm", "bn"), rest[6:], value)
            return
        if rest == "bn.act.weight":
            _set(params, base + ("br", "act", "alpha"), value)
            return
    raise KeyError(f"unknown ESP leaf {rest} at {base}")


def _import_decoder_key(params, stats, key: str, value) -> bool:
    if key.startswith("level3_C."):
        assert key == "level3_C.conv.weight"
        _set(params, ("level3_C", "conv", "kernel"), _conv(value))
    elif key.startswith("br."):
        _import_bn(params, stats, ("br",), key[3:], value)
    elif key.startswith("conv."):
        _import_cbr(params, stats, ("conv",), key[5:], value)
    elif key == "up_l3.0.weight":
        _set(params, ("up_l3", "kernel"), _convT(value))
    elif key.startswith("combine_l2_l3.0."):
        _import_br(params, stats, ("combine_l2_l3_br",), key[len("combine_l2_l3.0."):], value)
    elif key.startswith("combine_l2_l3.1."):
        _import_cbr(params, stats, ("combine_l2_l3_cbr",), key[len("combine_l2_l3.1."):], value)
    elif key == "up_l2.0.weight":
        _set(params, ("up_l2", "kernel"), _convT(value))
    elif key.startswith("up_l2.1."):
        _import_br(params, stats, ("up_l2_br",), key[len("up_l2.1."):], value)
    elif key == "classifier.weight":
        _set(params, ("classifier", "kernel"), _convT(value))
    else:
        return False
    return True


def state_dict_to_variables(state_dict: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a torch ESPNet(-C) state dict to flax ``{'params', 'batch_stats'}``.

    Handles both full encoder+decoder checkpoints (keys prefixed
    ``encoder.`` plus decoder keys) and encoder-only checkpoints.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    has_decoder = any(k.startswith("encoder.") for k in state_dict)
    for key, value in state_dict.items():
        value = np.asarray(value)
        if has_decoder:
            if key.startswith("encoder."):
                _import_encoder_key(params, stats, key[len("encoder."):], value,
                                    ("encoder",))
            elif not _import_decoder_key(params, stats, key, value):
                raise KeyError(f"unmapped decoder key: {key}")
        else:
            _import_encoder_key(params, stats, key, value, ())
    return {"params": params, "batch_stats": stats}


def load_espnet_variables(path: str) -> Dict[str, Any]:
    """Load a reference ``.pth`` checkpoint into flax variables.

    Also accepts full training checkpoints (``checkpoint.pth.tar``) whose
    weights live under a ``state_dict`` key (``main.py:413-423``).
    """
    obj = load_torch_pickle(path)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return state_dict_to_variables(obj)


def _inv_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))


def _inv_convT(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def _export_bn(out, prefix: str, p, s):
    out[prefix + "weight"] = np.asarray(p["scale"], np.float32)
    out[prefix + "bias"] = np.asarray(p["bias"], np.float32)
    out[prefix + "running_mean"] = np.asarray(s["mean"], np.float32)
    out[prefix + "running_var"] = np.asarray(s["var"], np.float32)
    out[prefix + "num_batches_tracked"] = np.asarray(0, np.int64)


def _export_cbr(out, prefix: str, p, s):
    out[prefix + "conv.weight"] = _inv_conv(p["c"]["conv"]["kernel"])
    _export_bn(out, prefix + "bn.", p["norm"]["bn"], s["norm"]["bn"])
    out[prefix + "act.weight"] = np.asarray(p["act"]["alpha"], np.float32)


def _export_br(out, prefix: str, p, s):
    _export_bn(out, prefix + "bn.", p["norm"]["bn"], s["norm"]["bn"])
    out[prefix + "act.weight"] = np.asarray(p["act"]["alpha"], np.float32)


def _export_esp(out, prefix: str, p, s, downsample: bool):
    for sub in ("c1", "d1", "d2", "d4", "d8", "d16"):
        out[prefix + sub + ".conv.weight"] = _inv_conv(p[sub]["conv"]["kernel"])
    if downsample:
        _export_bn(out, prefix + "bn.", p["norm"]["bn"], s["norm"]["bn"])
        out[prefix + "act.weight"] = np.asarray(p["act"]["alpha"], np.float32)
    else:
        _export_br(out, prefix + "bn.", p["br"], s["br"])


def variables_to_state_dict(variables: Mapping) -> Dict[str, np.ndarray]:
    """Inverse of :func:`state_dict_to_variables`: flax variables -> torch
    keys, so trained models export to the reference ``.pth`` layout."""
    params = variables["params"]
    stats = variables["batch_stats"]
    has_decoder = "encoder" in params
    out: Dict[str, np.ndarray] = {}

    def export_encoder(p, s, prefix: str):
        _export_cbr(out, prefix + "level1.", p["level1"], s["level1"])
        _export_br(out, prefix + "b1.", p["b1"], s["b1"])
        _export_esp(out, prefix + "level2_0.", p["down2"], s["down2"], True)
        i = 0
        while f"level2_{i}" in p:
            _export_esp(out, f"{prefix}level2.{i}.", p[f"level2_{i}"],
                        s[f"level2_{i}"], False)
            i += 1
        _export_br(out, prefix + "b2.", p["b2"], s["b2"])
        _export_esp(out, prefix + "level3_0.", p["down3"], s["down3"], True)
        i = 0
        while f"level3_{i}" in p:
            _export_esp(out, f"{prefix}level3.{i}.", p[f"level3_{i}"],
                        s[f"level3_{i}"], False)
            i += 1
        _export_br(out, prefix + "b3.", p["b3"], s["b3"])
        out[prefix + "classifier.conv.weight"] = _inv_conv(
            p["classifier"]["conv"]["kernel"])

    if has_decoder:
        export_encoder(params["encoder"], stats["encoder"], "encoder.")
        out["level3_C.conv.weight"] = _inv_conv(
            params["level3_C"]["conv"]["kernel"])
        _export_bn(out, "br.", params["br"], stats["br"])
        _export_cbr(out, "conv.", params["conv"], stats["conv"])
        out["up_l3.0.weight"] = _inv_convT(params["up_l3"]["kernel"])
        _export_br(out, "combine_l2_l3.0.", params["combine_l2_l3_br"],
                   stats["combine_l2_l3_br"])
        _export_cbr(out, "combine_l2_l3.1.", params["combine_l2_l3_cbr"],
                    stats["combine_l2_l3_cbr"])
        out["up_l2.0.weight"] = _inv_convT(params["up_l2"]["kernel"])
        _export_br(out, "up_l2.1.", params["up_l2_br"], stats["up_l2_br"])
        out["classifier.weight"] = _inv_convT(params["classifier"]["kernel"])
    else:
        export_encoder(params, stats, "")
    return out


def infer_architecture(state_dict: Mapping[str, np.ndarray]):
    """Infer (classes, p, q, decoder) from checkpoint keys/shapes."""
    has_decoder = any(k.startswith("encoder.") for k in state_dict)
    prefix = "encoder." if has_decoder else ""
    classes = state_dict[f"{prefix}classifier.conv.weight"].shape[0]
    p = 1 + max(
        (int(m.group(1)) for k in state_dict
         if (m := re.match(re.escape(prefix) + r"level2\.(\d+)\.", k))),
        default=-1,
    )
    q = 1 + max(
        (int(m.group(1)) for k in state_dict
         if (m := re.match(re.escape(prefix) + r"level3\.(\d+)\.", k))),
        default=-1,
    )
    return classes, p, q, has_decoder
