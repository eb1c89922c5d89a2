"""Faster R-CNN model tests: output contract + synthetic overfit training."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glomeruli_segmentation_tpu.models.faster_rcnn import (
    FasterRCNN,
    FasterRCNNConfig,
    build_anchors,
)
from glomeruli_segmentation_tpu.train.detector_train import detector_loss

TINY = FasterRCNNConfig(
    num_classes=1, image_size=(128, 128), stride=16,
    anchor_scales=(0.25, 0.5), anchor_aspects=(1.0,), anchor_base=128.0,
    pre_nms_top_n=128, post_nms_top_n=16, crop_size=8, max_detections=8,
    backbone="tiny")


def _blob_image(rng, boxes, size=128):
    img = np.full((size, size, 3), 220, np.uint8)
    img = np.clip(img + rng.randint(-10, 10, img.shape), 0, 255).astype(np.uint8)
    for y1, x1, y2, x2 in boxes:
        cy, cx = (y1 + y2) / 2, (x1 + x2) / 2
        r = (y2 - y1) / 2
        yy, xx = np.mgrid[:size, :size]
        mask = ((yy - cy) ** 2 + (xx - cx) ** 2) < r ** 2
        img[mask] = (120, 60, 100)
    return img


def test_detect_output_contract():
    model = FasterRCNN(TINY)
    anchors = build_anchors(TINY)
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, anchors,
                           method=FasterRCNN.detect)
    out = model.apply(variables, x, anchors, method=FasterRCNN.detect)
    assert out["detection_boxes"].shape == (2, 8, 4)
    assert out["detection_scores"].shape == (2, 8)
    assert out["detection_classes"].shape == (2, 8)
    assert out["num_detections"].shape == (2,)
    boxes = np.asarray(out["detection_boxes"])
    assert (boxes >= 0).all() and (boxes <= 1).all()


@pytest.mark.slow
def test_overfit_synthetic_blobs():
    """The detector machinery must be able to learn: overfit one image."""
    import optax

    rng = np.random.RandomState(0)
    gt = np.asarray([[20.0, 24.0, 60.0, 64.0], [75.0, 80.0, 115.0, 120.0]],
                    np.float32)
    img = _blob_image(rng, gt.astype(int))
    x = jnp.asarray(img[None]).astype(jnp.float32)
    gt_boxes = jnp.asarray(gt[None])
    gt_classes = jnp.ones((1, 2), jnp.int32)
    gt_valid = jnp.ones((1, 2), bool)

    model = FasterRCNN(TINY)
    anchors = build_anchors(TINY)
    variables = model.init(jax.random.key(1), x, anchors, train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, anchors,
                train=True, mutable=["batch_stats"])
            losses = detector_loss(anchors, out, gt_boxes, gt_classes,
                                   gt_valid)
            return losses["total"], (losses, updates["batch_stats"])

        (loss, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    loss0 = None
    for i in range(400):
        params, batch_stats, opt_state, loss = step(params, batch_stats,
                                                    opt_state)
        if loss0 is None:
            loss0 = float(loss)
    assert float(loss) < 0.2 * loss0, (loss0, float(loss))

    out = model.apply({"params": params, "batch_stats": batch_stats}, x,
                      anchors, method=FasterRCNN.detect)
    boxes = np.asarray(out["detection_boxes"][0]) * 128.0
    scores = np.asarray(out["detection_scores"][0])
    # best detections should land on the blobs
    def iou(a, b):
        yx1 = np.maximum(a[:2], b[:2])
        yx2 = np.minimum(a[2:], b[2:])
        wh = np.maximum(yx2 - yx1, 0)
        inter = wh[0] * wh[1]
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
        return inter / ua

    # machinery test, not a quality benchmark: detections must localize
    # both blobs (IoU well above chance), exact tightness varies with
    # backend numerics
    top = boxes[np.argsort(-scores)[:4]]
    for g in gt:
        assert max(iou(t, g) for t in top) > 0.35, (top, g)
