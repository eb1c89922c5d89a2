"""Tests for the analysis tool CLIs."""
import numpy as np
import pytest
from PIL import Image

from glomeruli_segmentation_tpu.tools import area_stats, label_transform
from glomeruli_segmentation_tpu.utils.labelme_io import lblsave


def _label_tree(tmp_path, values):
    d = tmp_path / "labels" / "H16-00001"
    d.mkdir(parents=True)
    lbl = np.zeros((40, 50), np.uint8)
    for i, (cls, n) in enumerate(values.items()):
        lbl.reshape(-1)[100 * i: 100 * i + n] = cls
    lblsave(str(d / "xmin10_ymin20_xmax60_ymax70.PNG"), lbl)
    return tmp_path / "labels"


def test_area_stats(tmp_path):
    label_dir = _label_tree(tmp_path, {1: 30, 2: 20, 4: 10})
    out = tmp_path / "result.csv"
    area_stats.main(["--label_data_dir", str(label_dir),
                     "--output_csv", str(out)])
    rows = out.read_text().strip().splitlines()
    assert rows[0].startswith("patient_id,file_name,xmin")
    cells = rows[1].split(",")
    assert cells[0] == "H16-00001"
    assert cells[2:6] == ["10", "20", "60", "70"]
    assert [int(v) for v in cells[6:]] == [40 * 50 - 60, 30, 20, 0, 10]


def test_label_transform(tmp_path):
    label_dir = _label_tree(tmp_path, {4: 25})
    label_transform.main(["--parent_dir", str(label_dir)])
    img = np.asarray(Image.open(
        label_dir / "H16-00001" / "xmin10_ymin20_xmax60_ymax70.PNG"))
    assert np.count_nonzero(img == 4) == 0
    assert np.count_nonzero(img == 1) == 25


def test_loss_plot(tmp_path):
    pytest.importorskip("pandas")
    pytest.importorskip("matplotlib")
    from glomeruli_segmentation_tpu.tools import loss_plot

    tsv = tmp_path / "trainValLog.txt"
    tsv.write_text(
        "Epoch\tLoss (train)\tLoss (val)\tmIoU (train)\tmIoU (val)\t"
        "Learning rate\t\n0\t0.9\t0.8\t0.2\t0.25\t0.0005\n"
        "1\t0.7\t0.6\t0.3\t0.35\t0.0005")
    out = tmp_path / "curves.png"
    loss_plot.main(["--loss_tsv", str(tsv), "--output_png", str(out)])
    assert out.exists() and out.stat().st_size > 0
