"""Faster R-CNN training losses (static-shape target assignment).

The reference trained its detector in the separate glomeruli_detection
repo with the TF OD API (the tree only consumes the frozen graph —
SURVEY.md §0); this module provides the equivalent capability natively so
detectors can be (re)trained for TPU.  Standard two-stage losses:

- RPN: anchors with IoU >= ``rpn_pos_iou`` to any GT (plus the best anchor
  per GT) are positive, IoU < ``rpn_neg_iou`` negative; softmax CE +
  smooth-L1 on encoded deltas.
- Box head: proposals with IoU >= ``roi_pos_iou`` are positive; softmax CE
  over C+1 classes + smooth-L1 on the matched class's deltas.

GT is passed padded: ``gt_boxes`` (N, G, 4) pixel [ymin,xmin,ymax,xmax],
``gt_classes`` (N, G) int 1-based, ``gt_valid`` (N, G) bool.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.boxes import boxes_iou, encode_boxes


def smooth_l1(x: jax.Array, delta: float = 1.0 / 9.0) -> jax.Array:
    ax = jnp.abs(x)
    return jnp.where(ax < delta, 0.5 * x * x / delta, ax - 0.5 * delta)


def _assign(anchors, gt_boxes, gt_valid, pos_iou, neg_iou,
            force_best: bool = True):
    """Per-anchor match: returns (matched_gt_idx, pos_mask, neg_mask)."""
    iou = boxes_iou(anchors, gt_boxes)  # (A, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    pos = best_iou >= pos_iou
    neg = best_iou < neg_iou
    if force_best:
        # the highest-IoU anchor for each valid GT is positive
        best_anchor = jnp.argmax(iou, axis=0)  # (G,)
        force = jnp.zeros(anchors.shape[0], bool).at[best_anchor].set(
            gt_valid & (jnp.max(iou, axis=0) > 0))
        pos = pos | force
        neg = neg & ~force
    return best_gt, pos, neg


def rpn_loss(anchors, rpn_obj, rpn_deltas, gt_boxes, gt_classes, gt_valid,
             pos_iou: float = 0.7, neg_iou: float = 0.3) -> Dict[str, jax.Array]:
    """Batched RPN loss. rpn_obj: (N, A, 2), rpn_deltas: (N, A, 4)."""

    def one(obj, deltas, boxes, valid):
        best_gt, pos, neg = _assign(anchors, boxes, valid, pos_iou, neg_iou)
        labels = pos.astype(jnp.int32)
        sample = pos | neg
        logp = jax.nn.log_softmax(obj, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        cls_loss = jnp.sum(ce * sample) / jnp.maximum(jnp.sum(sample), 1)
        targets = encode_boxes(boxes[best_gt], anchors)
        reg = smooth_l1(deltas - targets).sum(-1)
        reg_loss = jnp.sum(reg * pos) / jnp.maximum(jnp.sum(pos), 1)
        return cls_loss, reg_loss

    cls, reg = jax.vmap(one)(rpn_obj, rpn_deltas, gt_boxes, gt_valid)
    return {"rpn_cls": cls.mean(), "rpn_reg": reg.mean()}


def box_head_loss(proposals, class_scores, box_deltas, gt_boxes, gt_classes,
                  gt_valid, pos_iou: float = 0.5) -> Dict[str, jax.Array]:
    """Second-stage loss. proposals: (N, P, 4), class_scores: (N, P, C+1),
    box_deltas: (N, P, C, 4)."""

    def one(props, scores, deltas, boxes, classes, valid):
        iou = boxes_iou(props, boxes)
        iou = jnp.where(valid[None, :], iou, -1.0)
        best_gt = jnp.argmax(iou, axis=1)
        best_iou = jnp.max(iou, axis=1)
        pos = best_iou >= pos_iou
        # degenerate (all-pad NMS slots) proposals are ignored entirely
        live = (props[:, 2] > props[:, 0]) & (props[:, 3] > props[:, 1])
        labels = jnp.where(pos, classes[best_gt], 0)
        logp = jax.nn.log_softmax(scores, axis=-1)
        ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        cls_loss = jnp.sum(ce * live) / jnp.maximum(jnp.sum(live), 1)
        targets = encode_boxes(boxes[best_gt], props)
        cls_idx = jnp.maximum(labels - 1, 0)
        chosen = jnp.take_along_axis(
            deltas, cls_idx[:, None, None].repeat(4, -1), axis=1)[:, 0]
        reg = smooth_l1(chosen - targets).sum(-1)
        w = pos & live
        reg_loss = jnp.sum(reg * w) / jnp.maximum(jnp.sum(w), 1)
        return cls_loss, reg_loss

    cls, reg = jax.vmap(one)(proposals, class_scores, box_deltas, gt_boxes,
                             gt_classes, gt_valid)
    return {"roi_cls": cls.mean(), "roi_reg": reg.mean()}


def detector_loss(anchors, outputs, gt_boxes, gt_classes, gt_valid):
    losses = rpn_loss(anchors, outputs["rpn_objectness"],
                      outputs["rpn_deltas"], gt_boxes, gt_classes, gt_valid)
    losses.update(box_head_loss(
        jax.lax.stop_gradient(outputs["proposals"]),
        outputs["class_scores"], outputs["box_deltas"], gt_boxes, gt_classes,
        gt_valid))
    losses["total"] = (losses["rpn_cls"] + losses["rpn_reg"]
                       + losses["roi_cls"] + losses["roi_reg"])
    return losses
