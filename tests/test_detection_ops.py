"""Tests for box coding, NMS, and ROI cropping."""
import numpy as np
import jax.numpy as jnp

from glomeruli_segmentation_tpu.ops.boxes import (
    boxes_iou,
    clip_boxes,
    decode_boxes,
    encode_boxes,
    generate_anchors,
)
from glomeruli_segmentation_tpu.ops.nms import gather_padded, nms
from glomeruli_segmentation_tpu.ops.roi_align import crop_and_resize


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    anchors = np.stack([
        rng.uniform(0, 100, 64), rng.uniform(0, 100, 64),
        rng.uniform(110, 200, 64), rng.uniform(110, 200, 64)], axis=-1)
    boxes = anchors + rng.uniform(-10, 10, anchors.shape)
    boxes[:, 2:] = np.maximum(boxes[:, 2:], boxes[:, :2] + 1)
    deltas = encode_boxes(jnp.asarray(boxes), jnp.asarray(anchors))
    back = decode_boxes(deltas, jnp.asarray(anchors))
    np.testing.assert_allclose(np.asarray(back), boxes, rtol=1e-4, atol=1e-3)


def test_iou_matrix():
    a = jnp.asarray([[0, 0, 10, 10], [0, 0, 5, 5]], jnp.float32)
    b = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                    jnp.float32)
    iou = np.asarray(boxes_iou(a, b))
    np.testing.assert_allclose(iou[0], [1.0, 25 / 175, 0.0], atol=1e-6)
    np.testing.assert_allclose(iou[1], [0.25, 0.0, 0.0], atol=1e-6)


def test_anchor_grid():
    anchors = generate_anchors(4, 6, 16, scales=(0.5, 1.0),
                               aspect_ratios=(1.0,), base_size=64)
    assert anchors.shape == (4 * 6 * 2, 4)
    a0 = np.asarray(anchors[0])
    # first cell center at (8, 8); first anchor 32x32
    np.testing.assert_allclose(a0, [8 - 16, 8 - 16, 8 + 16, 8 + 16])


def _nms_reference(boxes, scores, iou_thr):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            yx1 = np.maximum(boxes[i, :2], boxes[j, :2])
            yx2 = np.minimum(boxes[i, 2:], boxes[j, 2:])
            wh = np.maximum(yx2 - yx1, 0)
            inter = wh[0] * wh[1]
            a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a2 = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (a1 + a2 - inter) >= iou_thr:
                suppressed[j] = True
    return keep


def test_nms_matches_reference():
    rng = np.random.RandomState(1)
    n = 120
    centers = rng.uniform(20, 200, (n, 2))
    sizes = rng.uniform(10, 60, (n, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           axis=-1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    want = _nms_reference(boxes, scores, 0.5)
    got, num = nms(jnp.asarray(boxes), jnp.asarray(scores), 128, 0.5)
    got = np.asarray(got)
    assert int(num) == len(want)
    np.testing.assert_array_equal(got[: len(want)], want)
    assert (got[len(want):] == -1).all()


def test_nms_score_threshold_and_gather():
    boxes = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110]], jnp.float32)
    scores = jnp.asarray([0.9, 0.1], jnp.float32)
    keep, num = nms(boxes, scores, 4, 0.5, score_threshold=0.5)
    assert int(num) == 1
    gathered = gather_padded(boxes, keep)
    np.testing.assert_array_equal(np.asarray(gathered[0]), [0, 0, 10, 10])
    assert (np.asarray(gathered[1:]) == 0).all()


def test_crop_and_resize_identity_and_subcrop():
    rng = np.random.RandomState(2)
    feat = rng.randn(16, 16, 3).astype(np.float32)
    # full-image crop at crop_size == H is the identity (endpoint-aligned)
    out = crop_and_resize(jnp.asarray(feat),
                          jnp.asarray([[0.0, 0.0, 1.0, 1.0]]), 16)
    np.testing.assert_allclose(np.asarray(out[0]), feat, atol=1e-5)
    # axis-aligned half crop: samples at integer positions
    out = crop_and_resize(jnp.asarray(feat),
                          jnp.asarray([[0.0, 0.0, 7 / 15, 7 / 15]]), 8)
    np.testing.assert_allclose(np.asarray(out[0]), feat[:8, :8], atol=1e-5)


def test_crop_and_resize_matmul_matches_gather():
    """The MXU two-tap-matrix crop must equal the gather formulation
    (exact on CPU; on TPU they differ only at default-matmul-precision
    truncation level)."""
    import jax.numpy as jnp

    from glomeruli_segmentation_tpu.ops.roi_align import (
        crop_and_resize,
        crop_and_resize_matmul,
    )

    rng = np.random.RandomState(7)
    feat = jnp.asarray(rng.rand(24, 32, 20).astype(np.float32))
    n = 150  # exercises the 100-box chunking
    y1 = rng.uniform(0, 0.8, n); y2 = y1 + rng.uniform(0.05, 0.2, n)
    x1 = rng.uniform(0, 0.8, n); x2 = x1 + rng.uniform(0.05, 0.2, n)
    boxes = jnp.asarray(np.stack([y1, x1, np.minimum(y2, 1.0),
                                  np.minimum(x2, 1.0)], 1).astype(np.float32))
    a = np.asarray(crop_and_resize(feat, boxes, 14))
    b = np.asarray(crop_and_resize_matmul(feat, boxes, 14))
    np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_read_detections_packing_roundtrip():
    """The packed single-readback must reproduce the four output arrays."""
    import jax.numpy as jnp

    from glomeruli_segmentation_tpu.pipeline.detect import _read_detections

    rng = np.random.RandomState(3)
    b, m = 3, 7
    out = {
        "detection_boxes": jnp.asarray(rng.rand(b, m, 4).astype(np.float32)),
        "detection_scores": jnp.asarray(rng.rand(b, m).astype(np.float32)),
        "detection_classes": jnp.asarray(
            np.ones((b, m), np.float32) * 2.0),
        "num_detections": jnp.asarray(
            rng.randint(0, m, b).astype(np.float32)),
    }
    boxes, scores, classes, num = _read_detections(out)
    np.testing.assert_array_equal(boxes, np.asarray(out["detection_boxes"]))
    np.testing.assert_array_equal(scores, np.asarray(out["detection_scores"]))
    np.testing.assert_array_equal(classes,
                                  np.asarray(out["detection_classes"]))
    np.testing.assert_array_equal(num, np.asarray(out["num_detections"]))


def test_tf1_resize_matches_scale_i_formula():
    """TF1 resize_bilinear (align_corners=False) samples at src=scale*i —
    no half-pixel shift.  Checked against a literal double loop; the OD-API
    frozen graph's keep_aspect_ratio_resizer uses exactly this sampling
    (compat_tf1_resize, VERDICT r2 item 4)."""
    from glomeruli_segmentation_tpu.ops.resize import (
        resize_bilinear,
        resize_bilinear_tf1,
        resize_bilinear_tf1_np,
    )

    rng = np.random.RandomState(0)
    img = rng.uniform(0, 255, (7, 11, 3)).astype(np.float32)
    out_h, out_w = 5, 6
    want = np.zeros((out_h, out_w, 3), np.float32)
    sy, sx = 7 / out_h, 11 / out_w
    for i in range(out_h):
        for j in range(out_w):
            y = min(i * sy, 6.0)
            x = min(j * sx, 10.0)
            y0, x0 = int(np.floor(y)), int(np.floor(x))
            y1, x1 = min(y0 + 1, 6), min(x0 + 1, 10)
            fy, fx = y - y0, x - x0
            top = img[y0, x0] * (1 - fx) + img[y0, x1] * fx
            bot = img[y1, x0] * (1 - fx) + img[y1, x1] * fx
            want[i, j] = top * (1 - fy) + bot * fy

    got_np = resize_bilinear_tf1_np(img, out_h, out_w)
    np.testing.assert_allclose(got_np, want, rtol=1e-5, atol=1e-4)
    got_jit = np.asarray(resize_bilinear_tf1(jnp.asarray(img), out_h, out_w))
    np.testing.assert_allclose(got_jit, want, rtol=1e-5, atol=1e-4)
    # and it differs from the half-pixel (cv2) sampling
    halfpix = np.asarray(resize_bilinear(jnp.asarray(img), out_h, out_w))
    assert np.abs(halfpix - want).max() > 1.0


def test_backend_tf1_resize_host_equals_device():
    """The compat resize is identical whether applied on host (numpy) or
    fused into the device program."""
    import sys
    import os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_od_api_import import build_od_api_consts

    from glomeruli_segmentation_tpu.pipeline.detect import (
        ODAPIDetectorBackend,
    )

    consts, _, _ = build_od_api_consts(seed=5)
    rng = np.random.RandomState(1)
    images = rng.randint(0, 255, (2, 128, 160, 3), np.uint8)
    results = []
    for device_resize in (False, True):
        backend = ODAPIDetectorBackend(
            consts=consts, batch_size=2, compute_dtype="float32",
            device_resize=device_resize, min_dimension=64, max_dimension=96,
            pre_nms_top_n=200, max_proposals=20, max_detections=10)
        results.append(backend.detect_batch(images))
    for a, b in zip(*results):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
