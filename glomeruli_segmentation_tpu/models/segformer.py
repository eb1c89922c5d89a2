"""SegFormer (MiT encoder + all-MLP decode head) in Flax, NHWC.

TPU-native rebuild of the HuggingFace ``SegformerForSemanticSegmentation``
the reference's GTCS variant fine-tunes (``module/SegFormer/train/train.py:
211-212``, default ``nvidia/mit-b0``).  Architecture follows the SegFormer
paper: overlapped patch embeddings, efficient attention with spatial
reduction, Mix-FFN with a depthwise 3x3, stage layer norms, and a decode
head that projects every stage to a common width, upsamples to 1/4 and
fuses with a 1x1 conv + BN.  Logits come out at 1/4 input resolution (the
caller upsamples to label size, ``train.py:46-52``).

Weight import from an HF checkpoint state dict is in
:mod:`..convert.segformer_import`.

Mixed precision: every module threads an optional ``dtype`` (flax
convention).  ``dtype=jnp.bfloat16`` runs the matmul-heavy encoder/head
in bf16 on the MXU while parameters and LayerNorm/BatchNorm statistics
stay float32 (flax normalization reduces in f32); attention softmax is
computed in f32 for stability.  ``dtype=None`` (default) is the
f32 HF-parity path.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class SegformerConfig:
    num_labels: int = 5
    hidden_sizes: Tuple[int, ...] = (32, 64, 160, 256)
    depths: Tuple[int, ...] = (2, 2, 2, 2)
    num_attention_heads: Tuple[int, ...] = (1, 2, 5, 8)
    sr_ratios: Tuple[int, ...] = (8, 4, 2, 1)
    patch_sizes: Tuple[int, ...] = (7, 3, 3, 3)
    strides: Tuple[int, ...] = (4, 2, 2, 2)
    mlp_ratio: int = 4
    decoder_hidden_size: int = 256
    layer_norm_eps: float = 1e-6


class OverlapPatchEmbed(nn.Module):
    dim: int
    patch_size: int
    stride: int
    eps: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        p = self.patch_size // 2
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), dtype=self.dtype,
                    name="proj")(x)
        n, h, w, c = x.shape
        x = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm")(x)
        return x, h, w


class EfficientAttention(nn.Module):
    dim: int
    heads: int
    sr_ratio: int
    eps: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x, h: int, w: int):
        n, _, c = x.shape
        head_dim = c // self.heads
        q = nn.Dense(c, dtype=self.dtype, name="q")(x)
        if self.sr_ratio > 1:
            kv_in = x.reshape(n, h, w, c)
            kv_in = nn.Conv(c, (self.sr_ratio, self.sr_ratio),
                            strides=(self.sr_ratio, self.sr_ratio),
                            dtype=self.dtype, name="sr")(kv_in)
            kv_in = kv_in.reshape(n, -1, c)
            kv_in = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                                 name="sr_norm")(kv_in)
        else:
            kv_in = x
        k = nn.Dense(c, dtype=self.dtype, name="k")(kv_in)
        v = nn.Dense(c, dtype=self.dtype, name="v")(kv_in)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads,
                             head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum("nhqd,nhkd->nhqk", q, k) / jnp.sqrt(
            jnp.asarray(head_dim, q.dtype))
        # softmax in f32 regardless of compute dtype (bf16 exp over long
        # key rows loses the tail), cast back for the value matmul
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        attn = attn.astype(v.dtype)
        out = jnp.einsum("nhqk,nhkd->nhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(n, -1, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class MixFFN(nn.Module):
    dim: int
    hidden: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, h: int, w: int):
        n, _, c = x.shape
        x = nn.Dense(self.hidden, dtype=self.dtype, name="dense1")(x)
        x = x.reshape(n, h, w, self.hidden)
        x = nn.Conv(self.hidden, (3, 3), padding=((1, 1), (1, 1)),
                    feature_group_count=self.hidden, dtype=self.dtype,
                    name="dwconv")(x)
        x = x.reshape(n, -1, self.hidden)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="dense2")(x)


class SegformerBlock(nn.Module):
    dim: int
    heads: int
    sr_ratio: int
    mlp_ratio: int
    eps: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x, h: int, w: int):
        y = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm1")(x)
        x = x + EfficientAttention(self.dim, self.heads, self.sr_ratio,
                                   self.eps, dtype=self.dtype,
                                   name="attn")(y, h, w)
        y = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="norm2")(x)
        x = x + MixFFN(self.dim, self.dim * self.mlp_ratio, dtype=self.dtype,
                       name="mlp")(y, h, w)
        return x


class MiTEncoder(nn.Module):
    config: SegformerConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        feats = []
        for i in range(len(cfg.hidden_sizes)):
            x, h, w = OverlapPatchEmbed(cfg.hidden_sizes[i],
                                        cfg.patch_sizes[i], cfg.strides[i],
                                        cfg.layer_norm_eps, dtype=self.dtype,
                                        name=f"patch_embed{i}")(x)
            n = x.shape[0]
            x = x.reshape(n, h * w, cfg.hidden_sizes[i])
            for j in range(cfg.depths[i]):
                x = SegformerBlock(cfg.hidden_sizes[i],
                                   cfg.num_attention_heads[i],
                                   cfg.sr_ratios[i], cfg.mlp_ratio,
                                   cfg.layer_norm_eps, dtype=self.dtype,
                                   name=f"block{i}_{j}")(x, h, w)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                             name=f"norm{i}")(x)
            x = x.reshape(n, h, w, cfg.hidden_sizes[i])
            feats.append(x)
        return feats


class SegformerHead(nn.Module):
    config: SegformerConfig
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        cfg = self.config
        n, h4, w4, _ = feats[0].shape
        projected = []
        for i, f in enumerate(feats):
            p = nn.Dense(cfg.decoder_hidden_size, dtype=self.dtype,
                         name=f"linear_c{i}")(f)
            if f.shape[1] != h4:
                p = jax.image.resize(p, (n, h4, w4, cfg.decoder_hidden_size),
                                     method="bilinear")
            projected.append(p)
        x = jnp.concatenate(projected[::-1], axis=-1)
        x = nn.Conv(cfg.decoder_hidden_size, (1, 1), use_bias=False,
                    dtype=self.dtype, name="linear_fuse")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        x = nn.relu(x)
        return nn.Conv(cfg.num_labels, (1, 1), dtype=self.dtype,
                       name="classifier")(x)


class Segformer(nn.Module):
    """Full model; logits at 1/4 input resolution (HF contract)."""

    config: SegformerConfig = SegformerConfig()
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        feats = MiTEncoder(self.config, dtype=self.dtype,
                           name="encoder")(x)
        return SegformerHead(self.config, dtype=self.dtype,
                             name="head")(feats, train)


def config_from_variables(variables, num_labels=None) -> SegformerConfig:
    """Infer the MiT geometry from a parameter tree so any variant
    (mit-b0..b5) loads without a hand-written config — the reference's
    ``--pretrained_model`` accepts any HF id (``SegFormer/train/
    train.py:140-141``).  Everything shape-recoverable is inferred
    (stage widths/depths, patch sizes, sr ratios, mlp ratio, decoder
    width, classifier labels); attention-head counts and strides are not
    visible in shapes and use the MiT-family constants, which are shared
    by every published variant."""
    import re

    params = variables.get("params", variables)
    enc = params["encoder"]
    n_stages = sum(1 for k in enc if str(k).startswith("patch_embed"))
    hidden = tuple(int(enc[f"patch_embed{i}"]["proj"]["bias"].shape[0])
                   for i in range(n_stages))
    depths = tuple(
        sum(1 for k in enc if re.fullmatch(rf"block{i}_\d+", str(k)))
        for i in range(n_stages))
    patch_sizes = tuple(int(enc[f"patch_embed{i}"]["proj"]["kernel"].shape[0])
                        for i in range(n_stages))
    sr_ratios = []
    for i in range(n_stages):
        srk = enc[f"block{i}_0"].get("attn", {}).get("sr", {}).get("kernel")
        sr_ratios.append(int(srk.shape[0]) if srk is not None else 1)
    mlp_ratio = int(enc["block0_0"]["mlp"]["dense1"]["bias"].shape[0]
                    // hidden[0])
    default = SegformerConfig()
    decoder = default.decoder_hidden_size
    head = params.get("head")
    if head is not None:
        decoder = int(head["linear_fuse"]["kernel"].shape[-1])
        if num_labels is None:
            num_labels = int(head["classifier"]["bias"].shape[0])
    if num_labels is None:
        num_labels = default.num_labels
    return SegformerConfig(
        num_labels=num_labels, hidden_sizes=hidden, depths=depths,
        num_attention_heads=default.num_attention_heads[:n_stages],
        sr_ratios=tuple(sr_ratios), patch_sizes=patch_sizes,
        strides=default.strides[:n_stages], mlp_ratio=mlp_ratio,
        decoder_hidden_size=decoder)


def upsample_logits(logits: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear upsample to label size, align_corners=False (the torch
    ``F.interpolate`` call at ``SegFormer/train/train.py:46-52``)."""
    from ..ops.resize import resize_bilinear

    return jax.vmap(lambda im: resize_bilinear(im, out_h, out_w))(logits)
