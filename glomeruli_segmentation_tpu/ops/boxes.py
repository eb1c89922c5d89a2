"""Box utilities for the detection stage (jittable, static shapes).

Conventions follow the TF Object Detection API the reference's frozen
Faster R-CNN graph was exported from (``detect_glomus_test.py:443-450``):
boxes are ``[ymin, xmin, ymax, xmax]``, anchor deltas are the standard
faster-rcnn ``(ty, tx, th, tw)`` parameterization with scale factors
(10, 10, 5, 5).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

BBOX_XFORM_CLIP = 4.135166556742356  # log(1000/16): clamp dh/dw like the OD API


def boxes_area(boxes: jax.Array) -> jax.Array:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * \
        jnp.maximum(boxes[..., 3] - boxes[..., 1], 0)


def boxes_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU. a: (N, 4), b: (M, 4) -> (N, M)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = boxes_area(a)[:, None] + boxes_area(b)[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def encode_boxes(boxes: jax.Array, anchors: jax.Array,
                 scales=(10.0, 10.0, 5.0, 5.0)) -> jax.Array:
    """Ground-truth boxes -> anchor-relative deltas (ty, tx, th, tw)."""
    ah = anchors[..., 2] - anchors[..., 0]
    aw = anchors[..., 3] - anchors[..., 1]
    acy = anchors[..., 0] + 0.5 * ah
    acx = anchors[..., 1] + 0.5 * aw
    bh = boxes[..., 2] - boxes[..., 0]
    bw = boxes[..., 3] - boxes[..., 1]
    bcy = boxes[..., 0] + 0.5 * bh
    bcx = boxes[..., 1] + 0.5 * bw
    eps = 1e-8
    ty = (bcy - acy) / (ah + eps) * scales[0]
    tx = (bcx - acx) / (aw + eps) * scales[1]
    th = jnp.log((bh + eps) / (ah + eps)) * scales[2]
    tw = jnp.log((bw + eps) / (aw + eps)) * scales[3]
    return jnp.stack([ty, tx, th, tw], axis=-1)


def decode_boxes(deltas: jax.Array, anchors: jax.Array,
                 scales=(10.0, 10.0, 5.0, 5.0)) -> jax.Array:
    """Anchor deltas -> boxes [ymin, xmin, ymax, xmax]."""
    ah = anchors[..., 2] - anchors[..., 0]
    aw = anchors[..., 3] - anchors[..., 1]
    acy = anchors[..., 0] + 0.5 * ah
    acx = anchors[..., 1] + 0.5 * aw
    ty = deltas[..., 0] / scales[0]
    tx = deltas[..., 1] / scales[1]
    th = jnp.clip(deltas[..., 2] / scales[2], max=BBOX_XFORM_CLIP)
    tw = jnp.clip(deltas[..., 3] / scales[3], max=BBOX_XFORM_CLIP)
    cy = ty * ah + acy
    cx = tx * aw + acx
    h = jnp.exp(th) * ah
    w = jnp.exp(tw) * aw
    return jnp.stack([cy - 0.5 * h, cx - 0.5 * w, cy + 0.5 * h,
                      cx + 0.5 * w], axis=-1)


def clip_boxes(boxes: jax.Array, height, width) -> jax.Array:
    ymin = jnp.clip(boxes[..., 0], 0, height)
    xmin = jnp.clip(boxes[..., 1], 0, width)
    ymax = jnp.clip(boxes[..., 2], 0, height)
    xmax = jnp.clip(boxes[..., 3], 0, width)
    return jnp.stack([ymin, xmin, ymax, xmax], axis=-1)


def generate_anchors(feat_h: int, feat_w: int, stride: int,
                     scales=(0.25, 0.5, 1.0, 2.0),
                     aspect_ratios=(0.5, 1.0, 2.0),
                     base_size: float = 256.0) -> jax.Array:
    """Grid anchors in pixel coords, OD API style: center-anchored boxes of
    ``base_size * scale`` area at every feature-map cell.

    Returns (feat_h * feat_w * A, 4) with A = len(scales)*len(aspect_ratios).
    """
    import numpy as np

    scales_grid, aspects_grid = np.meshgrid(scales, aspect_ratios)
    scales_grid = scales_grid.reshape(-1)
    aspects_grid = aspects_grid.reshape(-1)
    heights = scales_grid * np.sqrt(aspects_grid) * base_size
    widths = scales_grid / np.sqrt(aspects_grid) * base_size

    ys = (np.arange(feat_h) + 0.5) * stride
    xs = (np.arange(feat_w) + 0.5) * stride
    cx, cy = np.meshgrid(xs, ys)
    cy = cy.reshape(-1, 1)
    cx = cx.reshape(-1, 1)
    anchors = np.stack([
        np.broadcast_to(cy - heights / 2, (feat_h * feat_w, len(heights))),
        np.broadcast_to(cx - widths / 2, (feat_h * feat_w, len(widths))),
        np.broadcast_to(cy + heights / 2, (feat_h * feat_w, len(heights))),
        np.broadcast_to(cx + widths / 2, (feat_h * feat_w, len(widths))),
    ], axis=-1)
    return jnp.asarray(anchors.reshape(-1, 4).astype(np.float32))
