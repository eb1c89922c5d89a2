"""End-to-end tests for the per-crop segmentation stage."""
import json
import os
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from glomeruli_segmentation_tpu.ops.preprocess import (
    postprocess_nearest_host,
    preprocess_host,
)
from glomeruli_segmentation_tpu.pipeline.segment import (
    EspnetSegmenter,
    SegmenterConfig,
)

FOLD1_MEAN = [204.60071, 170.19359, 199.57469]
FOLD1_STD = [20.61257, 42.92207, 28.401505]


def _synthetic_crop(rng, h, w):
    """PAS-like pinkish crop with a dark blob."""
    img = np.full((h, w, 3), (200, 170, 205), np.uint8)
    img = img + rng.randint(-20, 20, size=img.shape).astype(np.int16)
    yy, xx = np.mgrid[:h, :w]
    blob = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) < (min(h, w) / 3) ** 2
    img[blob] = (150, 90, 160)
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def segmenter(reference_models_dir):
    cfg = SegmenterConfig(
        weights=str(reference_models_dir / "espnet_fold1.pth"),
        mean=FOLD1_MEAN, std=FOLD1_STD, batch_size=2)
    return EspnetSegmenter(cfg)


def test_preprocess_host_matches_reference_math():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(300, 487, 3)).astype(np.uint8)
    got = preprocess_host(img, FOLD1_MEAN, FOLD1_STD)
    # reference order (VisualizeResults_iou.py:103-119)
    ref = img.astype(np.float32)
    for j in range(3):
        ref[:, :, j] -= FOLD1_MEAN[j]
    for j in range(3):
        ref[:, :, j] /= FOLD1_STD[j]
    ref = cv2.resize(ref, (1024, 512))
    ref /= 255
    np.testing.assert_array_equal(got, ref)


def test_device_preprocess_equivalent_to_host(reference_models_dir):
    rng = np.random.RandomState(1)
    imgs = [_synthetic_crop(rng, 230, 310), _synthetic_crop(rng, 510, 420)]
    cfg = SegmenterConfig(
        weights=str(reference_models_dir / "espnet_fold1.pth"),
        mean=FOLD1_MEAN, std=FOLD1_STD, batch_size=2, device_preprocess=True)
    fast = EspnetSegmenter(cfg)
    batch_fast = np.asarray(fast.preprocess(imgs))
    host = [preprocess_host(im, FOLD1_MEAN, FOLD1_STD) for im in imgs]
    # resize-then-normalize == normalize-then-resize up to fp rounding
    np.testing.assert_allclose(batch_fast, np.stack(host), atol=2e-4)


def test_nearest_postprocess_matches_cv2():
    rng = np.random.RandomState(2)
    cmap = rng.randint(0, 5, size=(512, 1024)).astype(np.uint8)
    for (h, w) in [(300, 487), (777, 333), (512, 1024), (1200, 1600)]:
        got = postprocess_nearest_host(cmap, h, w)
        want = cv2.resize(cmap, (w, h), interpolation=cv2.INTER_NEAREST)
        np.testing.assert_array_equal(got, want)


def test_segment_parity_vs_torch_reference(segmenter, reference_models_dir):
    torch = pytest.importorskip("torch")
    ref_dir = "/root/reference/module/espnet/train"
    sys.path.insert(0, ref_dir)
    try:
        import Model as RefNet
    finally:
        sys.path.pop(0)
    ref = RefNet.ESPNet(classes=5, p=2, q=8)
    ref.load_state_dict(torch.load(
        str(reference_models_dir / "espnet_fold1.pth"), map_location="cpu",
        weights_only=False))
    ref.eval()

    rng = np.random.RandomState(3)
    imgs = [_synthetic_crop(rng, 260, 340), _synthetic_crop(rng, 450, 610)]
    ours = segmenter.segment_images(imgs)

    for img, got in zip(imgs, ours):
        x = preprocess_host(img, FOLD1_MEAN, FOLD1_STD)
        with torch.no_grad():
            out = ref(torch.from_numpy(x.transpose(2, 0, 1)[None]))
        ref_map = out[0].max(0)[1].byte().numpy()
        ref_map = cv2.resize(ref_map, (img.shape[1], img.shape[0]),
                             interpolation=cv2.INTER_NEAREST)
        agreement = (got == ref_map).mean()
        assert agreement > 0.999, f"class-map agreement {agreement}"


def test_run_segment_artifacts(tmp_path, reference_models_dir):
    from glomeruli_segmentation_tpu.cli.segment import build_parser
    from glomeruli_segmentation_tpu.pipeline.segment import run_segment
    from glomeruli_segmentation_tpu.utils.labelme_io import lblsave

    rng = np.random.RandomState(4)
    rgb_dir = tmp_path / "org_image" / "PAS-001"
    label_dir = tmp_path / "label" / "PAS-001"
    rgb_dir.mkdir(parents=True)
    label_dir.mkdir(parents=True)
    for i, (h, w) in enumerate([(220, 300), (340, 280), (256, 256)]):
        img = _synthetic_crop(rng, h, w)
        cv2.imwrite(str(rgb_dir / f"xmin{i}_ymin0_xmax{i+30}_ymax30.PNG"), img)
        lbl = np.zeros((h, w), np.uint8)
        lbl[h // 4: h // 2, w // 4: w // 2] = 1
        lblsave(str(label_dir / f"xmin{i}_ymin0_xmax{i+30}_ymax30.PNG"), lbl)

    savedir = tmp_path / "out"
    args = build_parser().parse_args([
        "--rgb_data_dir", str(tmp_path / "org_image"),
        "--label_data_dir", str(tmp_path / "label"),
        "--savedir", str(savedir),
        "--weights", str(reference_models_dir / "espnet_fold1.pth"),
        "--decoder", "--colored", "--overlay",
        "--mean", *[str(m) for m in FOLD1_MEAN],
        "--std", *[str(s) for s in FOLD1_STD],
        "--batch_size", "2",
    ])
    args.colored = True
    run_segment(args)

    assert (savedir / "summary_pixel.csv").exists()
    assert (savedir / "summary_accuracy.csv").exists()
    assert (savedir / "summary_dataset.csv").exists()
    assert (savedir / "overall_accuracy.txt").exists()
    pixel_rows = (savedir / "summary_pixel.csv").read_text().strip().splitlines()
    assert len(pixel_rows) == 4  # header + 3 crops
    # pixel counts sum to crop area
    row = pixel_rows[1].split(",")
    assert sum(int(v) for v in row[2:]) == 220 * 300

    jsons = list((savedir / "PAS-001").glob("*.json"))
    assert len(jsons) == 3
    doc = json.loads(jsons[0].read_text())
    assert set(doc) == {"shapes", "lineColor", "imagePath", "flags",
                        "fillColor", "imageData"}
    assert (savedir / "PAS-001").glob("*_overlay.jpg")


def test_segmenter_pack_output_matches_unpacked(segmenter,
                                                reference_models_dir):
    """EspnetSegmenter pack_output=True (byte-limited-link opt-in) must
    be byte-identical to the unpacked default on both public APIs, for
    the decoder net and the encoder-only (x8-upsample) variant."""
    import dataclasses

    rng = np.random.RandomState(7)
    imgs = [_synthetic_crop(rng, 260, 340), _synthetic_crop(rng, 512, 417)]

    packed = EspnetSegmenter(
        dataclasses.replace(segmenter.config, pack_output=True))
    for a, b in zip(segmenter.segment_images(imgs),
                    packed.segment_images(imgs)):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(segmenter.class_maps_net_res(imgs),
                                  packed.class_maps_net_res(imgs))

    enc_kw = dict(weights=str(reference_models_dir / "espnet_fold1.pth"),
                  mean=FOLD1_MEAN, std=FOLD1_STD, batch_size=2,
                  decoder=False)
    enc = EspnetSegmenter(SegmenterConfig(**enc_kw))
    enc_packed = EspnetSegmenter(SegmenterConfig(pack_output=True, **enc_kw))
    np.testing.assert_array_equal(enc.class_maps_net_res(imgs),
                                  enc_packed.class_maps_net_res(imgs))
