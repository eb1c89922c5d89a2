"""Native fine-tuning of the OD-API inception_v2 Faster R-CNN.

The reference only consumes the frozen graph; its detector training lived
in the Docker-overlay glomeruli_detection repo (SURVEY.md §0).  These
tests prove the imported architecture is trainable end-to-end: loss
computes and updates the imported parameter tree, the checkpoint
round-trips, and the detect CLI loads it like any other model dir.
"""
import numpy as np
import pytest

from test_od_api_import import build_od_api_consts

from glomeruli_segmentation_tpu.wsi.synthetic import (
    pas_like_image,
    write_pyramidal_tiff,
)

PATIENT = "H16-55555"


@pytest.fixture(scope="module")
def annotated_tree(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("odft")
    img, centers = pas_like_image(1536, 2048, seed=7, n_glomeruli=4)
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
    (tmp / "targets.txt").write_text(f"{PATIENT}/{PATIENT}\n")
    return tmp


@pytest.mark.slow
def test_finetune_updates_params_and_roundtrips(annotated_tree, tmp_path):
    import jax

    from glomeruli_segmentation_tpu.convert.pb_import import (
        assemble_od_api_params,
    )
    from glomeruli_segmentation_tpu.train.detector_driver import (
        DetectorTrainConfig,
    )
    from glomeruli_segmentation_tpu.train.od_api_finetune import (
        finetune_od_api,
        load_od_api_checkpoint,
    )

    consts, _, _ = build_od_api_consts(seed=3)
    init_params, _ = assemble_od_api_params(consts)
    cfg = DetectorTrainConfig(image_size=128, batch_size=2, steps=3,
                              lr=1e-3, max_gt=8)
    ckpt = finetune_od_api(
        "OPT_PAS", str(annotated_tree / "data"),
        str(annotated_tree / "targets.txt"), str(tmp_path / "model"),
        cfg, consts=consts,
        # anchors sized to the synthetic ds-8 glomeruli; fewer proposals
        # keep the CPU step small
        od_config_overrides={"anchor_base": 64.0, "max_proposals": 16,
                             "pre_nms_top_n": 256},
        log_every=1)
    assert ckpt.endswith("od_api_detector.ckpt.pth")

    params, num_classes, saved_cfg = load_od_api_checkpoint(ckpt)
    assert num_classes == 1
    assert saved_cfg["anchor_base"] == 64.0
    # training moved the weights and kept them finite
    moved, finite = [], []
    jax.tree.map(lambda a, b: moved.append(
        not np.allclose(np.asarray(a), np.asarray(b))), init_params, params)
    jax.tree.map(lambda a: finite.append(
        bool(np.isfinite(np.asarray(a)).all())), params)
    assert any(moved)
    assert all(finite)

    # the detect CLI's loader recognizes the checkpoint dir and the
    # backend runs inference with the fine-tuned weights (saved arch
    # constants as defaults, CLI geometry overrides on top)
    from glomeruli_segmentation_tpu.cli.detect import load_backend

    backend = load_backend(str(tmp_path / "model"), None, 2,
                           od_api_overrides={"min_dimension": 128,
                                             "max_dimension": 128,
                                             "max_proposals": 16})
    boxes, scores, classes, num = backend.detect_batch(
        np.zeros((2, 128, 128, 3), np.uint8))
    assert boxes.shape == (2, 100, 4) and scores.shape == (2, 100)
    assert np.isfinite(scores).all()


@pytest.mark.slow
def test_finetune_data_parallel_grads_match_single_device(annotated_tree):
    """Same gradient-level DP equivalence for the OD-API fine-tune step
    (see test_detector_driver.py for why gradients, not Adam
    trajectories, are compared)."""
    import jax

    from glomeruli_segmentation_tpu.convert.pb_import import (
        assemble_od_api_params,
    )
    from glomeruli_segmentation_tpu.models.od_api_frcnn import (
        ODAPIConfig,
        ODAPIFasterRCNN,
    )
    from glomeruli_segmentation_tpu.train.detector_driver import (
        DetectorTrainConfig,
        SlideWindowSampler,
        _jit_detector_step,
    )
    from glomeruli_segmentation_tpu.train.detector_train import detector_loss

    consts, _, _ = build_od_api_consts(seed=5)
    params, num_classes = assemble_od_api_params(consts)
    cfg = DetectorTrainConfig(image_size=128, batch_size=4, max_gt=8)
    od_cfg = ODAPIConfig(num_classes=num_classes, image_size=(128, 128),
                         anchor_base=64.0, max_proposals=16,
                         pre_nms_top_n=256)
    model = ODAPIFasterRCNN(params, od_cfg, compute_dtype="float32")
    sampler = SlideWindowSampler("OPT_PAS", str(annotated_tree / "data"),
                                 str(annotated_tree / "targets.txt"), cfg)
    x, gb, gc, gv = sampler.sample_batch(np.random.default_rng(2))
    x = np.asarray(x, np.float32)

    def grad_step(p, x, gb, gc, gv):
        def loss_fn(pp):
            out = model.train_outputs(x, params=pp)
            return detector_loss(model.anchors, out, gb, gc, gv)["total"]

        return jax.value_and_grad(loss_fn)(p)

    single, _ = _jit_detector_step(grad_step, n_state=1, n_batch=4,
                                   data_parallel=0, batch_size=4)
    sharded, bsh = _jit_detector_step(grad_step, n_state=1, n_batch=4,
                                      data_parallel=4, batch_size=4)
    jp = jax.tree.map(jax.numpy.asarray, params)
    loss_s, grads_s = single(jp, x, gb, gc, gv)
    loss_d, grads_d = sharded(jp, jax.device_put(x, bsh),
                              jax.device_put(gb, bsh),
                              jax.device_put(gc, bsh),
                              jax.device_put(gv, bsh))
    np.testing.assert_allclose(float(loss_s), float(loss_d), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(grads_s),
                    jax.tree_util.tree_leaves(grads_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
