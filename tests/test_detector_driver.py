"""Detector training driver -> checkpoint -> detect CLI chain."""
import numpy as np
import pytest

from glomeruli_segmentation_tpu.models.faster_rcnn import FasterRCNNConfig
from glomeruli_segmentation_tpu.train.detector_driver import (
    DetectorTrainConfig,
    SlideWindowSampler,
    train_detector,
)
from glomeruli_segmentation_tpu.wsi.synthetic import (
    pas_like_image,
    write_pyramidal_tiff,
)

PATIENT = "H16-22222"


@pytest.fixture(scope="module")
def annotated_tree(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("det")
    img, centers = pas_like_image(1536, 2048, seed=31, n_glomeruli=4)
    pdir = tmp / "data" / "02_PAS" / PATIENT
    (pdir / "annotations").mkdir(parents=True)
    write_pyramidal_tiff(str(pdir / f"{PATIENT}.tiff"), img, mpp=0.25,
                         objective_power=40.0, levels=4)
    objs = ""
    for cx, cy, r in centers:
        x1, y1 = (cx - r) // 8, (cy - r) // 8
        x2, y2 = (cx + r) // 8, (cy + r) // 8
        objs += (f"<object><name>glomerulus</name><bndbox>"
                 f"<xmin>{x1}</xmin><ymin>{y1}</ymin>"
                 f"<xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox></object>")
    (pdir / "annotations" / f"OPT_PAS_{PATIENT}_{PATIENT}_pw40_ds8.xml"
     ).write_text(f"<annotation>{objs}</annotation>")
    target = tmp / "targets.txt"
    target.write_text(f"{PATIENT}/{PATIENT}\n")
    return tmp


def test_window_sampler(annotated_tree):
    cfg = DetectorTrainConfig(image_size=128, batch_size=2, max_gt=8)
    sampler = SlideWindowSampler("OPT_PAS", str(annotated_tree / "data"),
                                 str(annotated_tree / "targets.txt"), cfg)
    rng = np.random.default_rng(0)
    found_gt = 0
    for _ in range(8):
        images, boxes, classes, valid = sampler.sample_batch(rng)
        assert images.shape == (2, 128, 128, 3)
        assert boxes.shape == (2, 8, 4)
        found_gt += int(valid.sum())
        live = boxes[valid]
        if len(live):
            assert (live[:, 2:] >= live[:, :2]).all()
            assert live.max() <= 128
    assert found_gt > 0  # positive-biased sampling finds GT windows


@pytest.mark.slow
def test_train_save_detect_chain(annotated_tree, tmp_path):
    model_dir = tmp_path / "model"
    cfg = DetectorTrainConfig(image_size=128, batch_size=2, steps=20,
                              lr=1e-3, max_gt=8)
    model_config = FasterRCNNConfig(
        image_size=(128, 128), backbone="tiny",
        anchor_scales=(0.25, 0.5), anchor_aspects=(1.0,), anchor_base=128.0,
        pre_nms_top_n=128, post_nms_top_n=16, crop_size=8, max_detections=8)
    ckpt = train_detector("OPT_PAS", str(annotated_tree / "data"),
                          str(annotated_tree / "targets.txt"),
                          str(model_dir), cfg, model_config, log_every=10)
    assert ckpt.endswith("detector.ckpt.pth")

    # the detect CLI loads the checkpoint and runs the sliding-window scan
    from glomeruli_segmentation_tpu.cli.detect import main as detect_main

    out_dir = tmp_path / "out"
    detect_main([
        "--model", str(model_dir),
        "--target_list", str(annotated_tree / "targets.txt"),
        "--data_dir", str(annotated_tree / "data"),
        "--staining", "OPT_PAS",
        "--output_dir", str(out_dir),
        "--output_file_ext", "_t",
        # 256 µm at mpp 0.25 / ds 8 -> 128-px windows matching the model
        "--window_size", "256", "--overlap_ratio", "0.0",
        "--conf_threshold", "0.05", "--batch_size", "2",
    ])
    csv_path = out_dir / "OPT_PAS_t.csv"
    assert csv_path.exists()
    # 20 steps won't give meaningful F1; the contract here is that the chain
    # runs and emits schema-correct rows when anything clears the threshold
    for row in csv_path.read_text().strip().splitlines():
        parts = row.split(",")
        assert parts[1] == f'"{PATIENT}"'
        assert float(parts[9]) >= 0.05


@pytest.mark.slow
def test_data_parallel_grads_match_single_device(annotated_tree):
    """--data_parallel correctness at the gradient level: the sharded jit
    (params replicated, window batch split over a 4-device mesh) must
    produce the same loss and gradients as the unsharded jit on the same
    batch.  Gradients discriminate real DP bugs (dropped shards, missing
    mean) that end-to-end Adam trajectories hide — Adam's normalization
    amplifies benign reduction-order noise to O(lr) while erasing scale
    errors."""
    import jax
    import jax.numpy as jnp

    from glomeruli_segmentation_tpu.models.faster_rcnn import (
        FasterRCNN,
        build_anchors,
    )
    from glomeruli_segmentation_tpu.train.detector_driver import (
        _jit_detector_step,
    )
    from glomeruli_segmentation_tpu.train.detector_train import detector_loss

    cfg = DetectorTrainConfig(image_size=128, batch_size=4, max_gt=8)
    model_config = FasterRCNNConfig(
        image_size=(128, 128), backbone="tiny",
        anchor_scales=(0.25, 0.5), anchor_aspects=(1.0,), anchor_base=128.0,
        pre_nms_top_n=128, post_nms_top_n=16, crop_size=8, max_detections=8)
    sampler = SlideWindowSampler("OPT_PAS", str(annotated_tree / "data"),
                                 str(annotated_tree / "targets.txt"), cfg)
    x, gb, gc, gv = sampler.sample_batch(np.random.default_rng(1))
    x = np.asarray(x, np.float32)

    model = FasterRCNN(model_config)
    anchors = build_anchors(model_config)
    variables = model.init(jax.random.key(0), jnp.asarray(x), anchors,
                           train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    # grads of the RPN losses with BN in inference mode: continuous and
    # well-conditioned, so sharded == unsharded holds tightly and a real
    # DP bug (dropped shard, missing mean) is unambiguous.  Train-mode
    # BN over a 4-sample batch at random init is too ill-conditioned for
    # an equality assertion — even eager-vs-jit on ONE device moves these
    # grads by ~1e-3 (measured), and NMS top-k makes the ROI-loss path
    # discretely schedule-sensitive on top; the DP reduction being
    # verified here is identical in either BN mode.
    def grad_step(params, batch_stats, x, gb, gc, gv):
        def loss_fn(p):
            out = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, anchors,
                train=False)
            losses = detector_loss(anchors, out, gb, gc, gv)
            return losses["rpn_cls"] + losses["rpn_reg"]

        return jax.value_and_grad(loss_fn)(params)

    single, _ = _jit_detector_step(grad_step, n_state=2, n_batch=4,
                                   data_parallel=0, batch_size=4)
    sharded, bsh = _jit_detector_step(grad_step, n_state=2, n_batch=4,
                                      data_parallel=4, batch_size=4)
    loss_s, grads_s = single(params, batch_stats, x, gb, gc, gv)
    loss_d, grads_d = sharded(
        params, batch_stats,
        jax.device_put(x, bsh), jax.device_put(gb, bsh),
        jax.device_put(gc, bsh), jax.device_put(gv, bsh))
    np.testing.assert_allclose(float(loss_s), float(loss_d), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grads_s),
                    jax.tree_util.tree_leaves(grads_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
