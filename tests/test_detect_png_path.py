"""Detect stage: PNG-input path (metadata from the target list) and the
device confusion-matrix op."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from glomeruli_segmentation_tpu.eval.iou_eval import device_confusion, fast_hist
from glomeruli_segmentation_tpu.pipeline.detect import GlomusDetector
from tests.test_detect_stage import BlobBackend


def test_detect_png_input(tmp_path):
    """PNG inputs carry slide metadata in the target list; detections are
    written at level-0 coordinates (window offsets x downsample)."""
    patient = "H16-55555"
    img = np.full((768, 1024, 3), 225, np.uint8)
    yy, xx = np.mgrid[:768, :1024]
    img[((yy - 400) ** 2 + (xx - 600) ** 2) < 60 ** 2] = (120, 70, 110)
    png_dir = tmp_path / "data" / "02_PAS" / patient
    png_dir.mkdir(parents=True)
    cv2.imwrite(str(png_dir / f"{patient}.png"), img[:, :, ::-1])

    # metadata: original slide 8192x6144 @40x, ds 8, mpp 0.25
    target_list = tmp_path / "targets.txt"
    target_list.write_text(
        f"{patient}/{patient}.png,8192,6144,40,8.0,0.25,0.25\n")

    detector = GlomusDetector(
        "OPT_PAS", str(target_list), str(tmp_path / "data"),
        str(tmp_path / "out"), "_png", window_size=512, overlap_ratio=0.5,
        conf_threshold=0.5, batch_size=4)
    detector.split_all(BlobBackend())

    rows = (tmp_path / "out" / "OPT_PAS_png.csv").read_text().splitlines()
    assert rows, "no detections on the PNG path"
    # overlapping windows produce sliver detections too; the best detection
    # must sit on the blob center at level-0 coords (PNG px x downsample 8)
    centers = []
    for row in rows:
        x1, y1, x2, y2 = [float(v) for v in row.split(",")[5:9]]
        centers.append(((x1 + x2) / 2, (y1 + y2) / 2))
    best = min(centers,
               key=lambda c: abs(c[0] - 600 * 8) + abs(c[1] - 400 * 8))
    assert abs(best[0] - 600 * 8) < 8 * 30, (best, centers)
    assert abs(best[1] - 400 * 8) < 8 * 30, (best, centers)


def test_detect_resume_skips_completed(tmp_path):
    patient = "H16-55556"
    img = np.full((256, 256, 3), 225, np.uint8)
    png_dir = tmp_path / "data" / "02_PAS" / patient
    png_dir.mkdir(parents=True)
    cv2.imwrite(str(png_dir / f"{patient}.png"), img)
    target_list = tmp_path / "targets.txt"
    target_list.write_text(
        f"{patient}/{patient}.png,2048,2048,40,8.0,0.25,0.25\n")

    kwargs = dict(window_size=512, overlap_ratio=0.5, conf_threshold=0.5,
                  batch_size=4)
    d1 = GlomusDetector("OPT_PAS", str(target_list), str(tmp_path / "data"),
                        str(tmp_path / "out"), "_r", **kwargs)
    d1.split_all(BlobBackend())
    log1 = (tmp_path / "out" / "OPT_PAS_r_log.csv").read_text()
    assert f'"{patient}.png"' in log1

    d2 = GlomusDetector("OPT_PAS", str(target_list), str(tmp_path / "data"),
                        str(tmp_path / "out"), "_r", resume=True, **kwargs)
    assert f"{patient}.png" in d2._completed
    d2.split_all(BlobBackend())
    # the completed slide was skipped: the log gains no duplicate rows
    log2 = (tmp_path / "out" / "OPT_PAS_r_log.csv").read_text()
    assert log2.count(patient) == 1


def test_device_confusion_matches_numpy():
    rng = np.random.RandomState(0)
    pred = rng.randint(0, 5, 1000).astype(np.int32)
    gt = rng.randint(0, 5, 1000).astype(np.int32)
    gt[::17] = 7  # out-of-range gt pixels must be dropped
    import jax.numpy as jnp

    got = np.asarray(device_confusion(jnp.asarray(pred), jnp.asarray(gt), 5))
    want = fast_hist(gt, pred, 5)
    np.testing.assert_array_equal(got, want)
