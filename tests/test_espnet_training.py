"""ESPNet training-loop tests on a tiny synthetic dataset.

Uses reduced image sizes (the reference's multi-scale pipeline at full
1536x768 is exercised implicitly — the loop code is identical, only the
Scale targets differ) to keep CPU compile time sane.
"""
import os
import pickle

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from glomeruli_segmentation_tpu.cli.train import build_parser
from glomeruli_segmentation_tpu.data import transforms as T
from glomeruli_segmentation_tpu.data.dataset import (
    DataLoader,
    SegmentationDataset,
)
from glomeruli_segmentation_tpu.data.load_data import (
    LoadData,
    create_dataset_txt,
)
from glomeruli_segmentation_tpu.train.espnet_train import EspnetTrainer
from glomeruli_segmentation_tpu.utils.labelme_io import lblsave


def _make_dataset(tmp_path, n_train=3, n_val=1, size=(160, 320)):
    rng = np.random.RandomState(0)
    for split, count in (("train", n_train), ("val", n_val)):
        rgb_dir = tmp_path / split / "rgb" / "P1"
        lbl_dir = tmp_path / split / "label" / "P1"
        rgb_dir.mkdir(parents=True)
        lbl_dir.mkdir(parents=True)
        for i in range(count):
            h, w = size
            img = np.full((h, w, 3), (210, 180, 205), np.uint8)
            lbl = np.zeros((h, w), np.uint8)
            cy, cx = rng.randint(h // 4, 3 * h // 4), rng.randint(w // 4,
                                                                  3 * w // 4)
            yy, xx = np.mgrid[:h, :w]
            mask = ((yy - cy) ** 2 + (xx - cx) ** 2) < (h // 5) ** 2
            img[mask] = (150, 90, 160)
            lbl[mask] = 1
            cv2.imwrite(str(rgb_dir / f"crop{i}.PNG"), img)
            lblsave(str(lbl_dir / f"crop{i}.PNG"), lbl)
    create_dataset_txt(str(tmp_path))


def test_load_data_stats(tmp_path):
    _make_dataset(tmp_path)
    cache = tmp_path / "cache.p"
    data = LoadData(str(tmp_path), 5, str(cache)).process_data()
    assert cache.exists()
    assert len(data["trainIm"]) == 3 and len(data["valIm"]) == 1
    # mean of per-image means, BGR; background dominates
    assert 170 < data["mean"][0] < 215
    assert data["classWeights"].shape == (5,)
    # absent classes get the max weight 1/ln(1.10)
    np.testing.assert_allclose(data["classWeights"][2],
                               1 / np.log(1.10), rtol=1e-5)
    cached = pickle.load(open(cache, "rb"))
    assert set(cached) == {"trainIm", "trainAnnot", "valIm", "valAnnot",
                           "mean", "std", "classWeights"}


def test_transform_pipeline_shapes():
    rng = np.random.default_rng(0)
    tf = T.Compose([
        T.Normalize([100, 100, 100], [10, 10, 10]),
        T.Scale(256, 128),
        T.RandomCropResize(16),
        T.RandomFlip(),
        T.ToTensor(8),
    ])
    img = np.random.randint(0, 255, (200, 300, 3)).astype(np.uint8)
    lbl = np.random.randint(0, 5, (200, 300)).astype(np.uint8)
    out_img, out_lbl = tf(rng, img, lbl)
    assert out_img.shape == (128, 256, 3)
    assert out_img.dtype == np.float32
    assert out_lbl.shape == (16, 32)  # label downsampled by scaleIn=8
    assert out_lbl.dtype == np.int32


@pytest.mark.slow
def test_training_loop_end_to_end(tmp_path):
    import torch

    _make_dataset(tmp_path)
    savedir = tmp_path / "results"
    args = build_parser().parse_args([
        "--data_dir", str(tmp_path),
        "--cached_data_file", str(tmp_path / "cache.p"),
        "--savedir", str(savedir),
        "--classes", "5", "--batch_size", "1", "--max_epochs", "2",
        "--scaleIn", "1", "--num_workers", "2",
    ])
    args.decoder = True
    args.pretrained = None

    trainer = EspnetTrainer(args)

    # shrink the multi-scale pipeline for CPU test time (loop code unchanged)
    orig_build = trainer.build_loaders

    def small_loaders(data):
        mean, std = data["mean"], data["std"]

        def pipe(w, h, crop):
            steps = [T.Normalize(mean, std), T.Scale(w, h)]
            if crop:
                steps.append(T.RandomCropResize(crop))
            steps += [T.RandomFlip(), T.ToTensor(args.scaleIn)]
            return T.Compose(steps)

        mk = lambda tf, b, seed: DataLoader(
            SegmentationDataset(data["trainIm"], data["trainAnnot"], tf), b,
            num_workers=2, seed=seed)
        return {
            "scale1": mk(pipe(192, 96, 8), 1, 1),
            "scale2": mk(pipe(160, 96, 8), 1, 2),
            "scale4": mk(pipe(64, 32, None), 2, 4),
            "scale3": mk(pipe(96, 48, 4), 2, 3),
            "main": mk(pipe(128, 64, 4), 2, 0),
            "val": DataLoader(
                SegmentationDataset(data["valIm"], data["valAnnot"],
                                    T.Compose([T.Normalize(mean, std),
                                               T.Scale(128, 64),
                                               T.ToTensor(args.scaleIn)])),
                2, shuffle=False, num_workers=2),
        }

    trainer.build_loaders = small_loaders
    trainer.run()

    savedir = str(args.savedir)  # suffixed by build_model
    assert savedir.endswith("_dec_2_8/")
    assert os.path.isfile(os.path.join(savedir, "checkpoint.pth.tar"))
    assert os.path.isfile(os.path.join(savedir, "model_2.pth"))
    assert os.path.isfile(os.path.join(savedir, "mean_std.txt"))
    assert os.path.isfile(os.path.join(savedir, "acc_1.txt"))
    log = open(os.path.join(savedir, "trainValLog.txt")).read().splitlines()
    assert log[0].startswith("Parameters:")
    assert len(log) == 4  # params, header, 2 epoch rows

    # the exported model loads into the reference torch architecture
    import sys
    sys.path.insert(0, "/root/reference/module/espnet/train")
    try:
        import Model as RefNet
    finally:
        sys.path.pop(0)
    ref = RefNet.ESPNet(classes=5, p=2, q=8)
    ref.load_state_dict(torch.load(os.path.join(savedir, "model_2.pth"),
                                   map_location="cpu", weights_only=False))

    # resume path restores epoch from checkpoint.pth.tar
    args2 = build_parser().parse_args([
        "--data_dir", str(tmp_path),
        "--cached_data_file", str(tmp_path / "cache.p"),
        "--savedir", str(tmp_path / "results"),
        "--classes", "5", "--batch_size", "1", "--max_epochs", "2",
        "--scaleIn", "1",
    ])
    args2.decoder = True
    args2.pretrained = None
    args2.resume = True
    args2.resumeLoc = os.path.join(savedir, "checkpoint.pth.tar")
    trainer2 = EspnetTrainer(args2)
    trainer2.build_loaders = small_loaders
    trainer2.run()  # start_epoch == max_epochs -> no training, clean exit
