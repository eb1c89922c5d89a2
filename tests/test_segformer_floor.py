"""SegFormer learning-acceptance bar (VERDICT r4 weak 3).

The reference's SegFormer is a *trained product*
(``module/SegFormer/train/train.py:275-289``); mirroring the ESPNet
floor test (test_espnet_training.py::test_training_reaches_miou_floor)
and the detector recall bar (test_detection_recall.py), a short REAL run
of the replicated recipe (AdamW + linear warmup, RandomCropResize/flip/
blur/contrast augments, eval-every-save-interval with best-checkpoint
pruning) on a synthetic GTCS population must clear a val-mIoU floor —
with the trained weights loaded back through the DEPLOYMENT path
(``pipeline/fused_segformer.load_segformer_checkpoint``: best checkpoint
discovered from log.txt, the reference's test.py:149-171 contract).
"""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from glomeruli_segmentation_tpu.utils.labelme_io import lblsave


def _learnable_gtcs_tree(tmp_path, n_specimens=5, crops_per=4, size=96):
    """A color-separable glomerulus population: warm tissue background,
    saturated violet blobs (class 1) — learnable by a short run while
    still exercising the full augmentation + ignore-index path."""
    rng = np.random.RandomState(7)
    root = tmp_path / "01_Todai" / "20260101"
    for s in range(n_specimens):
        spec = f"H16-1000{s}"
        rgb = root / "rgb" / spec
        lbl = root / "label" / "gtcs" / spec
        rgb.mkdir(parents=True)
        lbl.mkdir(parents=True)
        for i in range(crops_per):
            img = np.full((size, size, 3), 0, np.uint8)
            img[:] = (228, 205, 218)  # pale PAS-like tissue
            img = (img + rng.randint(-8, 8, img.shape)).clip(
                0, 255).astype(np.uint8)
            mask = np.zeros((size, size), np.uint8)
            cy, cx = rng.randint(32, size - 32, 2)
            r = rng.randint(22, 30)
            yy, xx = np.mgrid[:size, :size]
            blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < r ** 2
            img[blob] = (130, 60, 150)  # saturated violet
            mask[blob] = 1
            cv2.imwrite(str(rgb / f"xmin{i}_ymin0_xmax9_ymax9.PNG"),
                        img[:, :, ::-1])
            lblsave(str(lbl / f"xmin{i}_ymin0_xmax9_ymax9.PNG"), mask)
    return root


@pytest.mark.slow
def test_segformer_training_reaches_miou_floor(tmp_path):
    import jax.numpy as jnp

    from glomeruli_segmentation_tpu.cli.segformer_train import build_parser
    from glomeruli_segmentation_tpu.data.segformer_dataset import (
        ResizedGlomerularDataset,
    )
    from glomeruli_segmentation_tpu.eval.mean_iou import mean_iou
    from glomeruli_segmentation_tpu.models.segformer import (
        Segformer,
        config_from_variables,
        upsample_logits,
    )
    from glomeruli_segmentation_tpu.pipeline.fused_segformer import (
        load_segformer_checkpoint,
    )
    from glomeruli_segmentation_tpu.train.segformer_train import (
        train_segformer,
    )

    _learnable_gtcs_tree(tmp_path)
    # lr is a reference CLI knob (train.py --lr); the default 6e-5 needs
    # far more steps on this tiny population — the recipe structure
    # (warmup schedule, augments, eval/save cadence) is unchanged
    args = build_parser().parse_args([
        "--site", "01_Todai",
        "--data_root", str(tmp_path),
        "--data_date", "20260101",
        "--model_root", str(tmp_path / "models"),
        "--output_dir", "floor",
        "--num_labels", "5", "--fold", "1",
        "--batch_size", "4", "--max_epoch", "10",
        "--save_interval", "2", "--lr", "8e-4",
        "--input_size", "64", "--dl_num_workers", "2",
    ])
    out_dir = train_segformer(args)
    assert os.path.isfile(os.path.join(out_dir, "log.txt"))

    # deployment path: best checkpoint via log.txt discovery
    variables, num_labels = load_segformer_checkpoint(out_dir)
    assert num_labels == 5
    model = Segformer(config_from_variables(variables))

    val = ResizedGlomerularDataset(
        str(tmp_path / "01_Todai" / "20260101"), rgb_subdir="rgb",
        label_subdir="label/gtcs", transforms=None, mode="val", fold=1,
        input_size=64)
    preds, gts = [], []
    for i in range(len(val)):
        item = val.get(i, np.random.default_rng(0))
        logits = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            jnp.asarray(item["pixel_values"][None]))
        up = upsample_logits(logits, item["labels"].shape[0],
                             item["labels"].shape[1])
        preds.append(np.asarray(jnp.argmax(up, -1))[0])
        gts.append(item["labels"])
    m = mean_iou(preds, gts, num_labels=5, ignore_index=255)
    per = m["per_category_iou"]
    # the population holds exactly classes 0 (background) and 1
    # (glomerulus); floors calibrated on this recipe/population
    assert per[0] >= 0.85, m
    assert per[1] >= 0.50, m
    assert m["mean_iou"] >= 0.65, m
