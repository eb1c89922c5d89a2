"""ESPNet inference forward with Pallas-fused ESP blocks.

Functional (no flax traced modules) inference path over the same variable
tree as :class:`.espnet.ESPNet`: the p+q ESP residual blocks — ~75% of the
forward's wall clock — run through the fused Pallas kernel
(:mod:`..ops.pallas.esp_block`); the remaining layers (level1 CBR, the two
ESP downsamplers, BR glue, decoder) stay on XLA.  BN is folded into affine
scale/bias on the host at pack time, so this path is inference-only.

Parity: matches the flax forward to bf16 tolerance (argmax-stable); tested
in interpret mode against the fp32 flax reference.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas.esp_block import esp_block_fused, fold_bn, pack_esp_weights
from .espnet import avg_pool_3x3_s2, upconv2x2


def _conv(x, kernel, stride=1, dilation=1):
    k = kernel.shape[0]
    pad = (k - 1) // 2 * dilation
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (stride, stride),
        ((pad, pad), (pad, pad)), rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _affine_prelu(x, scale, bias, alpha):
    y = x * scale.astype(x.dtype) + bias.astype(x.dtype)
    return jnp.maximum(y, 0) + alpha.astype(x.dtype) * jnp.minimum(y, 0)


def _pack_affine(p, s):
    scale, bias = fold_bn(np.asarray(p["bn"]["scale"]),
                          np.asarray(p["bn"]["bias"]),
                          np.asarray(s["bn"]["mean"]),
                          np.asarray(s["bn"]["var"]))
    return jnp.asarray(scale), jnp.asarray(bias)


class FusedESPNet:
    """Packs an ESPNet variable tree once; applies the fused forward."""

    def __init__(self, variables: Dict[str, Any], classes: int = 5,
                 p: int = 2, q: int = 8, interpret: bool = False,
                 fuse_level2: bool = False, fuse_level3: bool = True):
        # level-3 (64x128x128) compiles fast and gains from the fused
        # kernel at small batch; the level-2 shape (128x256x64, n=12) is
        # pathologically slow in Mosaic codegen, so it defaults to the XLA
        # path.  fuse_level3=False runs level-3 on XLA too (folded-BN
        # affine path) — round-3 probes measured the crossover batch-
        # dependent, so both are selectable.
        self.classes, self.p, self.q = classes, p, q
        self.interpret = interpret
        self.fuse_level2 = fuse_level2
        self.fuse_level3 = fuse_level3
        params = variables["params"]
        stats = variables["batch_stats"]
        self.has_decoder = "encoder" in params
        enc_p = params["encoder"] if self.has_decoder else params
        enc_s = stats["encoder"] if self.has_decoder else stats
        self.enc = self._pack_encoder(enc_p, enc_s)
        if self.has_decoder:
            self.dec = self._pack_decoder(params, stats)

    # ---------------- packing ----------------
    def _pack_cbr(self, p, s):
        scale, bias = _pack_affine(p["norm"], s["norm"])
        return {"kernel": jnp.asarray(p["c"]["conv"]["kernel"]),
                "scale": scale, "bias": bias,
                "alpha": jnp.asarray(p["act"]["alpha"])}

    def _pack_br(self, p, s):
        scale, bias = _pack_affine(p["norm"], s["norm"])
        return {"scale": scale, "bias": bias,
                "alpha": jnp.asarray(p["act"]["alpha"])}

    def _pack_down(self, p, s):
        scale, bias = _pack_affine({"bn": p["norm"]["bn"]},
                                   {"bn": s["norm"]["bn"]})
        return {
            "c1": jnp.asarray(p["c1"]["conv"]["kernel"]),
            "branches": [jnp.asarray(p[m]["conv"]["kernel"])
                         for m in ("d1", "d2", "d4", "d8", "d16")],
            "scale": scale, "bias": bias,
            "alpha": jnp.asarray(p["act"]["alpha"]),
        }

    def _pack_esp_raw(self, p, s):
        """Raw kernels + folded affine for the XLA (unfused) block path."""
        scale, bias = _pack_affine({"bn": p["br"]["norm"]["bn"]},
                                   {"bn": s["br"]["norm"]["bn"]})
        return {
            "c1": jnp.asarray(p["c1"]["conv"]["kernel"]),
            "branches": [jnp.asarray(p[m]["conv"]["kernel"])
                         for m in ("d1", "d2", "d4", "d8", "d16")],
            "scale": scale, "bias": bias,
            "alpha": jnp.asarray(p["br"]["act"]["alpha"]),
        }

    def _esp_xla(self, pack, x):
        reduced = _conv(x, pack["c1"])
        outs = [_conv(reduced, k, dilation=d)
                for k, d in zip(pack["branches"], (1, 2, 4, 8, 16))]
        add1 = outs[1]
        add2 = add1 + outs[2]
        add3 = add2 + outs[3]
        add4 = add3 + outs[4]
        combine = jnp.concatenate([outs[0], add1, add2, add3, add4], -1)
        combine = x + combine
        return _affine_prelu(combine, pack["scale"], pack["bias"],
                             pack["alpha"])

    def _pack_encoder(self, p, s):
        enc = {
            "level1": self._pack_cbr(p["level1"], s["level1"]),
            "b1": self._pack_br(p["b1"], s["b1"]),
            "down2": self._pack_down(p["down2"], s["down2"]),
            # stack the blocks of a level: the forward scans over the
            # leading block axis so the Pallas kernel appears once per
            # level in the XLA program (10 inlined call sites would
            # multiply AOT compile time)
            # only the selected variant per level is packed: the unused
            # one would otherwise ride along as dead per-fold device
            # copies (q=8 x folds x both forms) in every ensemble stack
            "level2": jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[pack_esp_weights(p[f"level2_{i}"], s[f"level2_{i}"])
                  for i in range(self.p)]) if self.fuse_level2 else None,
            "level2_raw": [self._pack_esp_raw(p[f"level2_{i}"],
                                              s[f"level2_{i}"])
                           for i in range(self.p)],
            "b2": self._pack_br(p["b2"], s["b2"]),
            "down3": self._pack_down(p["down3"], s["down3"]),
            "level3": jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[pack_esp_weights(p[f"level3_{i}"], s[f"level3_{i}"])
                  for i in range(self.q)]) if self.fuse_level3 else None,
            "level3_raw": [self._pack_esp_raw(p[f"level3_{i}"],
                                              s[f"level3_{i}"])
                           for i in range(self.q)] if not self.fuse_level3
                          else None,
            "b3": self._pack_br(p["b3"], s["b3"]),
            "classifier": jnp.asarray(p["classifier"]["conv"]["kernel"]),
        }
        return enc

    def _pack_decoder(self, p, s):
        br_scale, br_bias = fold_bn(np.asarray(p["br"]["scale"]),
                                    np.asarray(p["br"]["bias"]),
                                    np.asarray(s["br"]["mean"]),
                                    np.asarray(s["br"]["var"]))
        return {
            "br_scale": jnp.asarray(br_scale),
            "br_bias": jnp.asarray(br_bias),
            "up_l3": jnp.asarray(p["up_l3"]["kernel"]),
            "level3_C": jnp.asarray(p["level3_C"]["conv"]["kernel"]),
            "comb_br": self._pack_br(p["combine_l2_l3_br"],
                                     s["combine_l2_l3_br"]),
            "comb_cbr": self._pack_cbr(p["combine_l2_l3_cbr"],
                                       s["combine_l2_l3_cbr"]),
            "up_l2": jnp.asarray(p["up_l2"]["kernel"]),
            "up_l2_br": self._pack_br(p["up_l2_br"], s["up_l2_br"]),
            "conv": self._pack_cbr(p["conv"], s["conv"]),
            "classifier": jnp.asarray(p["classifier"]["kernel"]),
        }

    # ---------------- forward pieces ----------------
    def _cbr(self, pack, x, stride=1):
        return _affine_prelu(_conv(x, pack["kernel"], stride),
                             pack["scale"], pack["bias"], pack["alpha"])

    def _br(self, pack, x):
        return _affine_prelu(x, pack["scale"], pack["bias"], pack["alpha"])

    def _down(self, pack, x):
        reduced = _conv(x, pack["c1"], stride=2)
        outs = [_conv(reduced, k, dilation=d)
                for k, d in zip(pack["branches"], (1, 2, 4, 8, 16))]
        add1 = outs[1]
        add2 = add1 + outs[2]
        add3 = add2 + outs[3]
        add4 = add3 + outs[4]
        combine = jnp.concatenate([outs[0], add1, add2, add3, add4], -1)
        return _affine_prelu(combine, pack["scale"], pack["bias"],
                             pack["alpha"])

    def _esp_chain(self, stacked_pack, x):
        """Run a level's blocks as a scan over the stacked weights: one
        Pallas call site regardless of depth."""
        interpret = self.interpret

        def body(h, pack):
            w1, wd, scale, bias, alpha = pack
            h = esp_block_fused(h, w1.astype(h.dtype), wd.astype(h.dtype),
                                scale, bias, alpha, add_residual=True,
                                interpret=interpret)
            return h, None

        out, _ = jax.lax.scan(body, x, stacked_pack)
        return out

    def encoder_forward(self, x, enc=None):
        enc = self.enc if enc is None else enc
        output0 = self._cbr(enc["level1"], x, stride=2)
        inp1 = avg_pool_3x3_s2(x)
        inp2 = avg_pool_3x3_s2(inp1)
        output0_cat = self._br(enc["b1"],
                               jnp.concatenate([output0, inp1], -1))
        output1_0 = self._down(enc["down2"], output0_cat)
        if self.fuse_level2:
            out = self._esp_chain(enc["level2"], output1_0)
        else:
            out = output1_0
            for pack in enc["level2_raw"]:
                out = self._esp_xla(pack, out)
        output1_cat = self._br(
            enc["b2"], jnp.concatenate([out, output1_0, inp2], -1))
        output2_0 = self._down(enc["down3"], output1_cat)
        if self.fuse_level3:
            out = self._esp_chain(enc["level3"], output2_0)
        else:
            out = output2_0
            for pack in enc["level3_raw"]:
                out = self._esp_xla(pack, out)
        output2_cat = self._br(enc["b3"],
                               jnp.concatenate([output2_0, out], -1))
        logits = _conv(output2_cat, enc["classifier"])
        return logits, output0_cat, output1_cat

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.apply_packed(self.enc,
                                 self.dec if self.has_decoder else None, x)

    def apply_packed(self, enc, dec, x: jax.Array) -> jax.Array:
        """Forward from explicit packed trees (used by the fold-scan
        ensemble, which stacks packs along a fold axis)."""
        enc_logits, output0_cat, output1_cat = self.encoder_forward(x, enc)
        if dec is None:
            return enc_logits
        y = enc_logits * dec["br_scale"].astype(x.dtype) + \
            dec["br_bias"].astype(x.dtype)
        output2_c = upconv2x2(y, dec["up_l3"])
        output1_c = _conv(output1_cat, dec["level3_C"])
        comb = jnp.concatenate([output1_c, output2_c], -1)
        comb = self._br(dec["comb_br"], comb)
        comb = self._cbr(dec["comb_cbr"], comb)
        comb = upconv2x2(comb, dec["up_l2"])
        comb = self._br(dec["up_l2_br"], comb)
        feats = self._cbr(dec["conv"],
                          jnp.concatenate([comb, output0_cat], -1))
        return upconv2x2(feats, dec["classifier"])
