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

    backend = load_backend(str(tmp_path / "model"), "unused.pb", 2,
                           od_api_overrides={"min_dimension": 128,
                                             "max_dimension": 128,
                                             "max_proposals": 16})
    boxes, scores, classes, num = backend.detect_batch(
        np.zeros((2, 128, 128, 3), np.uint8))
    assert boxes.shape == (2, 100, 4) and scores.shape == (2, 100)
    assert np.isfinite(scores).all()
