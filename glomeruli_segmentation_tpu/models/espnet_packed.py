"""Fold-packed ESPNet ensemble: all folds in one tensor, one pass.

Motivation (BASELINE.md "Round-3 device profile"): the 5-fold ensemble's
wall clock is dominated by a ~60 ms *per fold* fixed cost that lives in the
small-channel XLA segments (level1 19 ch at full res, level2 64 ch, decoder
5 ch).  Those segments are latency-bound far below HBM bandwidth — 16-64
channel NHWC ops fill at most 1/8 of the TPU's 128-wide lanes — and the
per-fold scan pays that cost once per fold.

This module packs the F fold networks into ONE network whose channel axis
carries all folds side by side (group-major layout: packed channel
``f * C + c`` holds fold ``f``'s channel ``c``):

- every conv becomes a single dense conv with a block-diagonal kernel
  (fold f's kernel occupies input block f / output block f; cross-fold
  blocks are zero).  Zeros are exact in any float dtype, so the packed
  conv computes precisely the per-fold convs — it just spends more (free,
  MFU is ~1.4%) MXU FLOPs to fill the lanes 5x better and touch HBM once
  instead of F times;
- BatchNorm is pre-folded into affine scale/bias (inference only) and all
  per-channel parameters (BN affine, PReLU alpha) concatenate over folds;
- the per-fold input normalization (BGR mean/std, reference
  ``README.md:243-249``) becomes a (B, H, W, 3F) normalized stack so the
  zero-padding of the first conv keeps its per-fold meaning;
- level3 (128 ch/fold — already lane-efficient, and the FLOP-dominant
  part where a 5x block-diagonal blow-up would NOT be free) stays
  per-fold, executed as a ``lax.scan`` over stacked fold weights exactly
  like the existing fold-scan engines;
- the fold probabilities are combined on the packed (B, H, W, F, classes)
  logits: softmax per fold, sum over folds, argmax — identical to
  :meth:`..pipeline.fused.EnsembleSegmenter._fold_argmax` semantics.

Reference semantics being packed: ``module/espnet/train/Model.py:130-214``
(ESP units), ``:242-304`` (encoder), ``:306-378`` (decoder); the ensemble
rule itself is the framework's fused-path design (the reference runs folds
as separate processes).
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .espnet import avg_pool_3x3_s2, upconv2x2
from .espnet_fused import FusedESPNet, _conv


def _block_diag(kernels: Sequence[np.ndarray]) -> jnp.ndarray:
    """Stack per-fold HWIO kernels into one block-diagonal HWIO kernel."""
    ks = [np.asarray(k, np.float32) for k in kernels]
    kh, kw, cin, cout = ks[0].shape
    out = np.zeros((kh, kw, len(ks) * cin, len(ks) * cout), np.float32)
    for f, k in enumerate(ks):
        out[:, :, f * cin: (f + 1) * cin, f * cout: (f + 1) * cout] = k
    return jnp.asarray(out)


def _cat(params: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Group-major packing of per-channel parameter vectors."""
    return jnp.concatenate([jnp.asarray(p) for p in params])


def _concat_groups(parts: Sequence[jax.Array], folds: int) -> jax.Array:
    """Per-fold channel concat of group-major tensors.

    Each part is (B, H, W, F*c_i) group-major; the result interleaves the
    parts within each fold's group: fold f's channels become
    ``[part0_f, part1_f, ...]`` — the reference's per-network concat order.
    """
    shaped = [p.reshape(p.shape[:3] + (folds, p.shape[3] // folds))
              for p in parts]
    merged = jnp.concatenate(shaped, axis=-1)
    return merged.reshape(merged.shape[:3] + (-1,))


def _affine_prelu(x, scale, bias, alpha):
    y = x * scale.astype(x.dtype) + bias.astype(x.dtype)
    return jnp.maximum(y, 0) + alpha.astype(x.dtype) * jnp.minimum(y, 0)


class PackedEnsembleESPNet:
    """F fold ESPNets packed into one block-diagonal forward.

    Parameters
    ----------
    variable_trees : per-fold flax variable trees (full net: encoder +
        decoder), as loaded by :func:`..convert.espnet_import.load_espnet_variables`.
    means / stds : per-fold BGR normalization constants, shape (F, 3).
    level3 : "xla" (folded-BN conv path) or "pallas" (fused ESP kernel) —
        the same batch-dependent crossover as the fold-scan engines.
    """

    def __init__(self, variable_trees: Sequence[Dict[str, Any]],
                 means: np.ndarray, stds: np.ndarray, classes: int = 5,
                 p: int = 2, q: int = 8, level3: str = "xla",
                 interpret: bool = False,
                 compute_dtype: str = "bfloat16",
                 accum_dtype: str = "float32",
                 precision: str = "default"):
        nets = [FusedESPNet(v, classes, p, q, interpret=interpret,
                            fuse_level3=(level3 == "pallas"))
                for v in variable_trees]
        for net in nets:
            assert net.has_decoder, "packed ensemble needs full fold nets"
        self.folds = len(nets)
        self.classes = classes
        self.p, self.q = p, q
        self.level3 = level3
        self._template = nets[0]
        self.compute_dtype = jnp.dtype(compute_dtype)
        self.accum_dtype = jnp.dtype(accum_dtype)
        self.precision = precision

        F = self.folds
        means = np.asarray(means, np.float32).reshape(F, 3)
        stds = np.asarray(stds, np.float32).reshape(F, 3)
        # x15 = (img - mean_f) / std_f / 255 per fold: affine in the image
        self.norm_scale = jnp.asarray(
            (1.0 / (stds * 255.0)).reshape(-1), jnp.float32)
        self.norm_bias = jnp.asarray(
            (-means / (stds * 255.0)).reshape(-1), jnp.float32)

        encs = [n.enc for n in nets]
        decs = [n.dec for n in nets]

        def bd(path_fn):
            return _block_diag([path_fn(e) for e in encs])

        def cat(path_fn, trees=None):
            return _cat([path_fn(t) for t in (trees or encs)])

        self.enc = {
            "level1_k": bd(lambda e: e["level1"]["kernel"]),
            "level1_scale": cat(lambda e: e["level1"]["scale"]),
            "level1_bias": cat(lambda e: e["level1"]["bias"]),
            "level1_alpha": cat(lambda e: e["level1"]["alpha"]),
            "b1_scale": cat(lambda e: e["b1"]["scale"]),
            "b1_bias": cat(lambda e: e["b1"]["bias"]),
            "b1_alpha": cat(lambda e: e["b1"]["alpha"]),
            "down2": self._pack_down([e["down2"] for e in encs]),
            "level2": [self._pack_esp([e["level2_raw"][i] for e in encs])
                       for i in range(p)],
            "b2_scale": cat(lambda e: e["b2"]["scale"]),
            "b2_bias": cat(lambda e: e["b2"]["bias"]),
            "b2_alpha": cat(lambda e: e["b2"]["alpha"]),
            "down3": self._pack_down([e["down3"] for e in encs]),
        }
        # level3 + b3 + classifier stay per-fold: stack fold weights for a
        # lax.scan (dynamic-weight convs keep XLA's dense conv selection —
        # vmap over weights would lower to slow batched-group convs)
        stack = lambda trees: jax.tree.map(lambda *xs: jnp.stack(xs), *trees)
        if level3 == "pallas":
            self.level3_scan = stack([e["level3"] for e in encs])
        else:
            self.level3_scan = [
                stack([e["level3_raw"][i] for e in encs])
                for i in range(q)]
        self.b3_scan = stack([{"scale": e["b3"]["scale"],
                               "bias": e["b3"]["bias"],
                               "alpha": e["b3"]["alpha"]} for e in encs])
        self.cls_scan = jnp.stack([e["classifier"] for e in encs])

        self.dec = {
            "br_scale": cat(lambda d: d["br_scale"], decs),
            "br_bias": cat(lambda d: d["br_bias"], decs),
            "up_l3": _block_diag([d["up_l3"] for d in decs]),
            "level3_C": _block_diag([d["level3_C"] for d in decs]),
            "comb_br_scale": cat(lambda d: d["comb_br"]["scale"], decs),
            "comb_br_bias": cat(lambda d: d["comb_br"]["bias"], decs),
            "comb_br_alpha": cat(lambda d: d["comb_br"]["alpha"], decs),
            "comb_k": _block_diag([d["comb_cbr"]["kernel"] for d in decs]),
            "comb_scale": cat(lambda d: d["comb_cbr"]["scale"], decs),
            "comb_bias": cat(lambda d: d["comb_cbr"]["bias"], decs),
            "comb_alpha": cat(lambda d: d["comb_cbr"]["alpha"], decs),
            "up_l2": _block_diag([d["up_l2"] for d in decs]),
            "up_l2_br_scale": cat(lambda d: d["up_l2_br"]["scale"], decs),
            "up_l2_br_bias": cat(lambda d: d["up_l2_br"]["bias"], decs),
            "up_l2_br_alpha": cat(lambda d: d["up_l2_br"]["alpha"], decs),
            "conv_k": _block_diag([d["conv"]["kernel"] for d in decs]),
            "conv_scale": cat(lambda d: d["conv"]["scale"], decs),
            "conv_bias": cat(lambda d: d["conv"]["bias"], decs),
            "conv_alpha": cat(lambda d: d["conv"]["alpha"], decs),
            "classifier": _block_diag([d["classifier"] for d in decs]),
        }

    # ---------------- packing helpers ----------------
    def _pack_down(self, packs: List[Dict[str, Any]]) -> Dict[str, Any]:
        return {
            "c1": _block_diag([p["c1"] for p in packs]),
            "branches": [_block_diag([p["branches"][i] for p in packs])
                         for i in range(5)],
            "scale": _cat([p["scale"] for p in packs]),
            "bias": _cat([p["bias"] for p in packs]),
            "alpha": _cat([p["alpha"] for p in packs]),
        }

    def _pack_esp(self, packs: List[Dict[str, Any]]) -> Dict[str, Any]:
        # ESP residual block shares the downsampler's structure (1x1
        # reduce instead of strided 3x3), Model.py:162-214
        return self._pack_down(packs)

    # ---------------- forward ----------------
    def _down_fwd(self, pack, x, stride):
        reduced = _conv(x, pack["c1"], stride=stride)
        outs = [_conv(reduced, k, dilation=d)
                for k, d in zip(pack["branches"], (1, 2, 4, 8, 16))]
        add1 = outs[1]
        add2 = add1 + outs[2]
        add3 = add2 + outs[3]
        add4 = add3 + outs[4]
        combine = _concat_groups([outs[0], add1, add2, add3, add4],
                                 self.folds)
        return combine, pack

    def _down(self, pack, x):
        combine, pack = self._down_fwd(pack, x, stride=2)
        return _affine_prelu(combine, pack["scale"], pack["bias"],
                             pack["alpha"])

    def _esp(self, pack, x):
        combine, pack = self._down_fwd(pack, x, stride=1)
        combine = x + combine  # residual, Model.py:211-212
        return _affine_prelu(combine, pack["scale"], pack["bias"],
                             pack["alpha"])

    def _level3_per_fold(self, out2_0_packed: jax.Array) -> jax.Array:
        """(B, h, w, 128F) group-major -> (B, h, w, 5F) packed enc logits.

        Runs level3 + b3 + classifier per fold via lax.scan over stacked
        fold weights (128 ch/fold already fills the lanes; a block-diagonal
        form here would 5x the FLOP-dominant convs for no lane gain)."""
        b, h, w, _ = out2_0_packed.shape
        F = self.folds
        x3 = out2_0_packed.reshape(b, h, w, F, -1).transpose(3, 0, 1, 2, 4)
        template = self._template

        def body(_, per_fold):
            x_f, l3, b3, cls_k = per_fold
            if self.level3 == "pallas":
                out = template._esp_chain(l3, x_f)
            else:
                out = x_f
                for blk in l3:
                    out = template._esp_xla(blk, out)
            out2_cat = _affine_prelu(
                jnp.concatenate([x_f, out], -1),
                b3["scale"], b3["bias"], b3["alpha"])
            return None, _conv(out2_cat, cls_k)

        _, enc_logits = jax.lax.scan(
            body, None,
            (x3, self.level3_scan, self.b3_scan, self.cls_scan))
        # (F, B, h, w, classes) -> (B, h, w, F*classes) group-major
        return enc_logits.transpose(1, 2, 3, 0, 4).reshape(
            b, h, w, F * self.classes)

    def packed_logits(self, resized: jax.Array) -> jax.Array:
        """Raw resized BGR crops (B, H, W, 3) -> (B, H, W, F, classes)."""
        enc = self.enc
        dec = self.dec
        F = self.folds
        b = resized.shape[0]
        # per-fold normalization as a (B, H, W, 3F) stack so conv zero-
        # padding keeps its normalized-domain (per-fold) meaning
        x = resized.astype(jnp.float32)
        x15 = (jnp.tile(x, (1, 1, 1, F)) * self.norm_scale
               + self.norm_bias).astype(self.compute_dtype)

        with jax.default_matmul_precision(self.precision):
            out0 = _affine_prelu(_conv(x15, enc["level1_k"], stride=2),
                                 enc["level1_scale"], enc["level1_bias"],
                                 enc["level1_alpha"])
            inp1 = avg_pool_3x3_s2(x15)
            inp2 = avg_pool_3x3_s2(inp1)
            out0_cat = _affine_prelu(
                _concat_groups([out0, inp1], F),
                enc["b1_scale"], enc["b1_bias"], enc["b1_alpha"])
            out1_0 = self._down(enc["down2"], out0_cat)
            out = out1_0
            for blk in enc["level2"]:
                out = self._esp(blk, out)
            out1_cat = _affine_prelu(
                _concat_groups([out, out1_0, inp2], F),
                enc["b2_scale"], enc["b2_bias"], enc["b2_alpha"])
            out2_0 = self._down(enc["down3"], out1_cat)

            enc_logits = self._level3_per_fold(out2_0)

            # RUM decoder, packed (Model.py:330-339,370-378)
            y = enc_logits * dec["br_scale"].astype(enc_logits.dtype) \
                + dec["br_bias"].astype(enc_logits.dtype)
            out2_c = upconv2x2(y, dec["up_l3"])
            out1_c = _conv(out1_cat, dec["level3_C"])
            comb = _affine_prelu(
                _concat_groups([out1_c, out2_c], F),
                dec["comb_br_scale"], dec["comb_br_bias"],
                dec["comb_br_alpha"])
            comb = _affine_prelu(_conv(comb, dec["comb_k"]),
                                 dec["comb_scale"], dec["comb_bias"],
                                 dec["comb_alpha"])
            comb = upconv2x2(comb, dec["up_l2"])
            comb = _affine_prelu(comb, dec["up_l2_br_scale"],
                                 dec["up_l2_br_bias"],
                                 dec["up_l2_br_alpha"])
            feats = _affine_prelu(
                _conv(_concat_groups([comb, out0_cat], F), dec["conv_k"]),
                dec["conv_scale"], dec["conv_bias"], dec["conv_alpha"])
            logits = upconv2x2(feats, dec["classifier"])
        bh, hh, wh, _ = logits.shape
        return logits.reshape(bh, hh, wh, F, self.classes)

    def __call__(self, resized: jax.Array) -> jax.Array:
        """Raw resized BGR crops -> (B, H, W) uint8 ensemble argmax."""
        logits = self.packed_logits(resized)
        probs = jax.nn.softmax(logits.astype(self.accum_dtype), axis=-1)
        return jnp.argmax(probs.sum(axis=3), axis=-1).astype(jnp.uint8)
