"""Fold-packed ESPNet ensemble: all folds in one tensor, one pass.

Motivation (BASELINE.md "Round-3 device profile"): the 5-fold ensemble's
wall clock is dominated by a ~60 ms *per fold* fixed cost that lives in the
small-channel XLA segments (level1 19 ch at full res, level2 64 ch, decoder
5 ch).  Those segments are latency-bound far below HBM bandwidth — 16-64
channel NHWC ops fill at most 1/8 of the TPU's 128-wide lanes — and the
per-fold scan pays that cost once per fold.

This module packs the F fold networks into ONE network whose channel axis
carries all folds side by side:

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

**Channel layout (round-3 measured refinement).**  The reference's ESP
concat order interleaves branch outputs *within* each fold (group-major:
packed channel ``f * C + c``).  Materializing that order after every
block forced a physical relayout of a GB-scale, 128-lane-tiled tensor
(reshape -> concat -> reshape: ~6 ms extra per call site at B=48 vs a
plain concat, ~10 call sites).  Tensors therefore stay **part-major**
physically (plain ``concatenate([d1, add1, ...])``), and the fold-major
semantic order is restored for free by permuting the *input-channel rows
of each consumer conv kernel* (and per-channel affine/PReLU parameters)
once at pack time.  Residual adds stay consistent because every level-2
tensor shares the same part structure; only the level-3 per-fold split
pays one physical gather (which the old layout paid anyway as its
reshape/transpose).

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

from ..ops.pallas.esp_block import _esp_dma_call, esp_pad_io, esp_unpad_io
from .espnet import avg_pool_3x3_s2, upconv2x2
from .espnet_fused import FusedESPNet, _conv


def _block_diag(kernels: Sequence[np.ndarray]) -> np.ndarray:
    """Stack per-fold HWIO kernels into one block-diagonal HWIO kernel.

    Both axes are in the *semantic* fold-major order (fold f's channel c
    at packed index ``f * C + c``); input-axis rows are re-permuted per
    consumer via :func:`_permute_kernel_in` when the producing tensor is
    part-major."""
    ks = [np.asarray(k, np.float32) for k in kernels]
    kh, kw, cin, cout = ks[0].shape
    out = np.zeros((kh, kw, len(ks) * cin, len(ks) * cout), np.float32)
    for f, k in enumerate(ks):
        out[:, :, f * cin: (f + 1) * cin, f * cout: (f + 1) * cout] = k
    return out


def _cat(params: Sequence[np.ndarray]) -> np.ndarray:
    """Fold-major (semantic) packing of per-channel parameter vectors."""
    return np.concatenate([np.asarray(p) for p in params])


def _concat_groups(parts: Sequence[jax.Array], folds: int) -> jax.Array:
    """Per-fold channel concat of group-major tensors (fold-major result).

    Retained for reference/testing; the production forward keeps tensors
    part-major and permutes consumer kernels instead (module docstring).
    """
    shaped = [p.reshape(p.shape[:3] + (folds, p.shape[3] // folds))
              for p in parts]
    merged = jnp.concatenate(shaped, axis=-1)
    return merged.reshape(merged.shape[:3] + (-1,))


def _identity_perm(folds: int, per_fold: int) -> np.ndarray:
    return np.arange(folds * per_fold, dtype=np.int64)


def _concat_perm(parts: Sequence[tuple], folds: int) -> np.ndarray:
    """phys->sem map of ``concatenate([t_0, t_1, ...], -1)``.

    ``parts`` is a list of (perm_phys_to_sem, per_fold_width); the
    semantic space of the result is fold-major over the concatenated
    per-fold widths (the reference's per-network concat order)."""
    total = sum(w for _, w in parts)
    offsets = np.cumsum([0] + [w for _, w in parts])[:-1]
    out = []
    for (perm, w), off in zip(parts, offsets):
        f, c = perm // w, perm % w
        out.append(f * total + off + c)
    return np.concatenate(out)


def _pos_of_sem(perm: np.ndarray) -> np.ndarray:
    """Inverse map: physical position holding each semantic channel."""
    pos = np.empty_like(perm)
    pos[perm] = np.arange(perm.size, dtype=perm.dtype)
    return pos


def _permute_kernel_in(kernel: np.ndarray, perm: np.ndarray) -> jnp.ndarray:
    """Reindex a sem-ordered HWIO kernel's input rows for a part-major
    producer: physical input row i carries semantic channel perm[i]."""
    return jnp.asarray(kernel[:, :, perm, :])


def _permute_vec(vec: np.ndarray, perm: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.asarray(vec)[perm])


def _esp_fused_operands(pack) -> tuple:
    """Part-major packed ESP block dict -> ``esp_block_fused`` operands.

    The Pallas kernel's output concat ``[d1, add1..add4]`` is exactly the
    packed engine's part-major physical layout, and its folded affine
    consumes the already out_perm-permuted scale/bias/alpha — so a packed
    (block-diagonal) ESP block rides the proven level-3 kernel unchanged:
    ``w1`` is the in_perm-permuted block-diagonal 1x1 reduce and ``wd``
    stacks the block-diagonal dilated taps along the contraction axis
    (cross-fold zeros are exact; the MXU fills 128 lanes either way).
    """
    w1 = np.asarray(pack["c1"])[0, 0]  # (C, n)
    n = w1.shape[1]
    widths = [np.asarray(b).shape[-1] for b in pack["branches"]]
    n_pad = max(widths)
    wd = np.zeros((5, 9 * n, n_pad), np.float32)
    for i, b in enumerate(pack["branches"]):
        k = np.asarray(b)  # (3, 3, n, width_i) block-diagonal
        for tap in range(9):
            dy, dx = divmod(tap, 3)
            wd[i, tap * n: (tap + 1) * n, : k.shape[-1]] = k[dy, dx]
    return (jnp.asarray(w1), jnp.asarray(wd), jnp.asarray(pack["scale"]),
            jnp.asarray(pack["bias"]), jnp.asarray(pack["alpha"]))


def _affine_prelu(x, scale, bias, alpha):
    y = x * scale.astype(x.dtype) + bias.astype(x.dtype)
    return jnp.maximum(y, 0) + alpha.astype(x.dtype) * jnp.minimum(y, 0)


def _affine(x, scale, bias):
    return x * scale.astype(x.dtype) + bias.astype(x.dtype)


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
                 level2: str = "xla", level2_pack_taps: bool = False,
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
        self.level2 = level2
        self.level2_pack_taps = level2_pack_taps
        self.interpret = interpret
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

        # ---- physical channel layouts (phys -> semantic fold-major) ----
        # x15, conv outputs, pools of x15: identity (fold-major).
        id3 = _identity_perm(F, 3)
        c1_out = encs[0]["level1"]["kernel"].shape[-1]  # 16 per fold
        self.perm95 = _concat_perm([(_identity_perm(F, c1_out), c1_out),
                                    (id3, 3)], F)  # out0_cat: [out0|inp1]

        def down_widths(pack):
            # per-fold branch output widths [n1, n, n, n, n] from one
            # fold's (unpacked) kernels
            return [np.asarray(b).shape[-1] for b in pack["branches"]]

        w2 = down_widths(encs[0]["down2"])  # [n1, n, n, n, n] = [16,12x4]
        pf2 = sum(w2)  # 64
        self.perm320 = _concat_perm(
            [(_identity_perm(F, w), w) for w in w2], F)
        w3 = down_widths(encs[0]["down3"])  # [28, 25 x 4]
        pf3 = sum(w3)  # 128
        self.perm640 = _concat_perm(
            [(_identity_perm(F, w), w) for w in w3], F)
        # out1_cat: [level2_out (perm320) | out1_0 (perm320) | inp2 (id)]
        self.perm655 = _concat_perm([(self.perm320, pf2),
                                     (self.perm320, pf2), (id3, 3)], F)
        self.pos640 = _pos_of_sem(self.perm640)  # level-3 per-fold gather
        idc = _identity_perm(F, classes)
        self.perm50 = _concat_perm([(idc, classes), (idc, classes)], F)
        self.perm120 = _concat_perm([(idc, classes),
                                     (self.perm95, c1_out + 3)], F)

        self.enc = {
            "level1_k": jnp.asarray(bd(lambda e: e["level1"]["kernel"])),
            "level1_scale": jnp.asarray(cat(lambda e: e["level1"]["scale"])),
            "level1_bias": jnp.asarray(cat(lambda e: e["level1"]["bias"])),
            "level1_alpha": jnp.asarray(cat(lambda e: e["level1"]["alpha"])),
            "b1_scale": _permute_vec(cat(lambda e: e["b1"]["scale"]),
                                     self.perm95),
            "b1_bias": _permute_vec(cat(lambda e: e["b1"]["bias"]),
                                    self.perm95),
            "b1_alpha": _permute_vec(cat(lambda e: e["b1"]["alpha"]),
                                     self.perm95),
            "down2": self._pack_down([e["down2"] for e in encs],
                                     in_perm=self.perm95,
                                     out_perm=self.perm320),
            "level2": [self._pack_esp([e["level2_raw"][i] for e in encs],
                                      perm=self.perm320)
                       for i in range(p)],
            "b2_scale": _permute_vec(cat(lambda e: e["b2"]["scale"]),
                                     self.perm655),
            "b2_bias": _permute_vec(cat(lambda e: e["b2"]["bias"]),
                                    self.perm655),
            "b2_alpha": _permute_vec(cat(lambda e: e["b2"]["alpha"]),
                                     self.perm655),
            "down3": self._pack_down([e["down3"] for e in encs],
                                     in_perm=self.perm655,
                                     out_perm=self.perm640),
        }
        if level2 == "pallas":
            # the packed (320-ch) level-2 blocks through the fused Pallas
            # ESP kernel, W-tiled past the Mosaic spatial-extent wall;
            # stacked for a lax.scan (one Pallas call site for both blocks)
            ops = [_esp_fused_operands(blk) for blk in self.enc["level2"]]
            self.level2_kernel = jax.tree.map(
                lambda *xs: jnp.stack(xs), *ops)
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
            "br_scale": jnp.asarray(cat(lambda d: d["br_scale"], decs)),
            "br_bias": jnp.asarray(cat(lambda d: d["br_bias"], decs)),
            "up_l3": jnp.asarray(_block_diag([d["up_l3"] for d in decs])),
            "level3_C": _permute_kernel_in(
                _block_diag([d["level3_C"] for d in decs]), self.perm655),
            "comb_br_scale": _permute_vec(
                cat(lambda d: d["comb_br"]["scale"], decs), self.perm50),
            "comb_br_bias": _permute_vec(
                cat(lambda d: d["comb_br"]["bias"], decs), self.perm50),
            "comb_br_alpha": _permute_vec(
                cat(lambda d: d["comb_br"]["alpha"], decs), self.perm50),
            "comb_k": _permute_kernel_in(
                _block_diag([d["comb_cbr"]["kernel"] for d in decs]),
                self.perm50),
            "comb_scale": jnp.asarray(
                cat(lambda d: d["comb_cbr"]["scale"], decs)),
            "comb_bias": jnp.asarray(
                cat(lambda d: d["comb_cbr"]["bias"], decs)),
            "comb_alpha": jnp.asarray(
                cat(lambda d: d["comb_cbr"]["alpha"], decs)),
            "up_l2": jnp.asarray(_block_diag([d["up_l2"] for d in decs])),
            "up_l2_br_scale": jnp.asarray(
                cat(lambda d: d["up_l2_br"]["scale"], decs)),
            "up_l2_br_bias": jnp.asarray(
                cat(lambda d: d["up_l2_br"]["bias"], decs)),
            "up_l2_br_alpha": jnp.asarray(
                cat(lambda d: d["up_l2_br"]["alpha"], decs)),
            "conv_k": _permute_kernel_in(
                _block_diag([d["conv"]["kernel"] for d in decs]),
                self.perm120),
            "conv_scale": jnp.asarray(cat(lambda d: d["conv"]["scale"],
                                          decs)),
            "conv_bias": jnp.asarray(cat(lambda d: d["conv"]["bias"], decs)),
            "conv_alpha": jnp.asarray(cat(lambda d: d["conv"]["alpha"],
                                          decs)),
            "classifier": jnp.asarray(
                _block_diag([d["classifier"] for d in decs])),
        }

    # ---------------- packing helpers ----------------
    def _pack_down(self, packs: List[Dict[str, Any]], in_perm: np.ndarray,
                   out_perm: np.ndarray) -> Dict[str, Any]:
        """c1 consumes a part-major input (in_perm); the block's affine
        consumes the part-major branch concat (out_perm)."""
        return {
            "c1": _permute_kernel_in(
                _block_diag([p["c1"] for p in packs]), in_perm),
            "branches": [jnp.asarray(
                _block_diag([p["branches"][i] for p in packs]))
                for i in range(5)],
            "scale": _permute_vec(_cat([p["scale"] for p in packs]),
                                  out_perm),
            "bias": _permute_vec(_cat([p["bias"] for p in packs]),
                                 out_perm),
            "alpha": _permute_vec(_cat([p["alpha"] for p in packs]),
                                  out_perm),
        }

    def _pack_esp(self, packs: List[Dict[str, Any]],
                  perm: np.ndarray) -> Dict[str, Any]:
        # ESP residual block shares the downsampler's structure (1x1
        # reduce instead of strided 3x3), Model.py:162-214; input and
        # branch-concat output share the same part structure (perm)
        return self._pack_down(packs, in_perm=perm, out_perm=perm)

    # ---------------- forward ----------------
    def _down_fwd(self, pack, x, stride):
        reduced = _conv(x, pack["c1"], stride=stride)
        outs = [_conv(reduced, k, dilation=d)
                for k, d in zip(pack["branches"], (1, 2, 4, 8, 16))]
        add1 = outs[1]
        add2 = add1 + outs[2]
        add3 = add2 + outs[3]
        add4 = add3 + outs[4]
        # part-major: no physical interleave; consumers carry the
        # fold-major permutation in their packed parameters
        combine = jnp.concatenate([outs[0], add1, add2, add3, add4], -1)
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

    def _esp_chain_packed(self, x: jax.Array) -> jax.Array:
        """The p packed level-2 ESP blocks as one scanned Pallas call.

        Same kernel family as ``FusedESPNet._esp_chain`` — the packed
        320-channel shape fills the kernel's matmul lanes ~5x better than
        the per-fold 64-channel form that measured below XLA — but via
        the strip-DMA variant: the whole-image VMEM window of the plain
        kernel cannot be double-buffered at 128x256x320 (measured VMEM
        OOM, see ``esp_block_fused_dma``).  The kernel's padded HBM
        layout (zero halo columns + zero 128-aligned pad channels) is
        maintained across the chain, so the pad/unpad copies happen once
        per level, not once per block."""
        interpret = self.interpret
        pack_taps = self.level2_pack_taps
        c = x.shape[-1]

        def body(h, pack):
            w1, wd, scale, bias, alpha = pack
            h = _esp_dma_call(h, w1.astype(h.dtype), wd.astype(h.dtype),
                              scale, bias, alpha, add_residual=True,
                              interpret=interpret, pack_taps=pack_taps)
            return h, None

        out, _ = jax.lax.scan(body, esp_pad_io(x), self.level2_kernel)
        return esp_unpad_io(out, c)

    def _level3_per_fold(self, out2_0_packed: jax.Array) -> jax.Array:
        """(B, h, w, 128F) part-major -> (B, h, w, 5F) packed enc logits.

        Runs level3 + b3 + classifier per fold via lax.scan over stacked
        fold weights (128 ch/fold already fills the lanes; a block-diagonal
        form here would 5x the FLOP-dominant convs for no lane gain).  The
        per-fold split performs the one physical channel gather of the
        part-major layout (the fold-major layout paid an equivalent
        reshape/transpose here)."""
        b, h, w, _ = out2_0_packed.shape
        F = self.folds
        sem = out2_0_packed[..., self.pos640]  # fold-major gather
        x3 = sem.reshape(b, h, w, F, -1).transpose(3, 0, 1, 2, 4)
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
        # (F, B, h, w, classes) -> (B, h, w, F*classes) fold-major
        return enc_logits.transpose(1, 2, 3, 0, 4).reshape(
            b, h, w, F * self.classes)

    def packed_feats(self, resized: jax.Array) -> jax.Array:
        """Raw resized BGR crops (B, H, W, 3) -> decoder features
        (B, H/2, W/2, F*classes), i.e. everything up to (excluding) the
        final 2x2-stride-2 classifier upconv."""
        enc = self.enc
        dec = self.dec
        F = self.folds
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
                jnp.concatenate([out0, inp1], -1),  # layout perm95
                enc["b1_scale"], enc["b1_bias"], enc["b1_alpha"])
            out1_0 = self._down(enc["down2"], out0_cat)  # layout perm320
            if self.level2 == "pallas":
                out = self._esp_chain_packed(out1_0)
            else:
                out = out1_0
                for blk in enc["level2"]:
                    out = self._esp(blk, out)
            out1_cat = _affine_prelu(
                jnp.concatenate([out, out1_0, inp2], -1),  # perm655
                enc["b2_scale"], enc["b2_bias"], enc["b2_alpha"])
            out2_0 = self._down(enc["down3"], out1_cat)  # layout perm640

            enc_logits = self._level3_per_fold(out2_0)  # fold-major

            # RUM decoder, packed (Model.py:330-339,370-378)
            y = _affine(enc_logits, dec["br_scale"], dec["br_bias"])
            out2_c = upconv2x2(y, dec["up_l3"])  # fold-major
            out1_c = _conv(out1_cat, dec["level3_C"])  # fold-major
            comb = _affine_prelu(
                jnp.concatenate([out1_c, out2_c], -1),  # perm50
                dec["comb_br_scale"], dec["comb_br_bias"],
                dec["comb_br_alpha"])
            comb = _affine_prelu(_conv(comb, dec["comb_k"]),
                                 dec["comb_scale"], dec["comb_bias"],
                                 dec["comb_alpha"])  # fold-major
            comb = upconv2x2(comb, dec["up_l2"])
            comb = _affine_prelu(comb, dec["up_l2_br_scale"],
                                 dec["up_l2_br_bias"],
                                 dec["up_l2_br_alpha"])
            feats = _affine_prelu(
                _conv(jnp.concatenate([comb, out0_cat], -1),  # perm120
                      dec["conv_k"]),
                dec["conv_scale"], dec["conv_bias"], dec["conv_alpha"])
        return feats  # fold-major

    def packed_logits(self, resized: jax.Array) -> jax.Array:
        """Raw resized BGR crops (B, H, W, 3) -> (B, H, W, F, classes)."""
        feats = self.packed_feats(resized)
        with jax.default_matmul_precision(self.precision):
            logits = upconv2x2(feats, self.dec["classifier"])  # fold-major
        bh, hh, wh, _ = logits.shape
        return logits.reshape(bh, hh, wh, self.folds, self.classes)

    def _ensemble_argmax(self, logits_fc: jax.Array) -> jax.Array:
        """(..., F, classes) logits -> (...) uint8 ensemble argmax."""
        probs = jax.nn.softmax(logits_fc.astype(self.accum_dtype), axis=-1)
        return jnp.argmax(probs.sum(axis=-2), axis=-1).astype(jnp.uint8)

    def __call__(self, resized: jax.Array) -> jax.Array:
        """Raw resized BGR crops -> (B, H, W) uint8 ensemble argmax."""
        return self._ensemble_argmax(self.packed_logits(resized))

    def gathered_argmax(self, resized: jax.Array, ys: jax.Array,
                        xs: jax.Array) -> jax.Array:
        """Ensemble argmax at gathered output pixels only: (B, oh, ow).

        ``ys``/``xs`` are (B, oh)/(B, ow) int32 row/column tables into the
        full-resolution (H, W) class map — the /8 stitch tables of
        :meth:`..pipeline.fused.EnsembleSegmenter.segment_batch_gather`.

        The gather commutes through the final 2x2-stride-2 classifier
        upconv: output pixel (y, x) depends on exactly one feature pixel
        (y//2, x//2) through the (y%2, x%2) phase kernel (upconv2x2's
        einsum + pixel shuffle).  Gathering *before* the upconv avoids
        materializing the full-res logits at all — (B, 512, 1024, 25)
        bf16 pads its 25-channel minor dim to 128 lanes on TPU, so the
        skipped tail is ~6 GB of HBM writes plus the softmax/argmax pass
        over it (measured in BASELINE.md "Fold-packed ensemble")."""
        feats = self.packed_feats(resized)
        K = self.dec["classifier"]  # (2, 2, C, C) block-diagonal
        F, C = self.folds, self.folds * self.classes

        with jax.default_matmul_precision(self.precision):
            def one(f, y_idx, x_idx):
                g = f[y_idx // 2][:, x_idx // 2]  # (oh, ow, C)
                phases = [
                    jnp.einsum("hwc,co->hwo", g, K[u, v].astype(g.dtype))
                    for u in (0, 1) for v in (0, 1)]
                py = (y_idx % 2)[:, None, None]
                px = (x_idx % 2)[None, :, None]
                logits = jnp.where(
                    py == 0,
                    jnp.where(px == 0, phases[0], phases[1]),
                    jnp.where(px == 0, phases[2], phases[3]))
                return logits  # (oh, ow, C) fold-major

            logits = jax.vmap(one)(feats, ys, xs)
        oh, ow = logits.shape[1:3]
        logits_fc = logits.reshape(-1, oh, ow, F, self.classes)
        return self._ensemble_argmax(logits_fc)
