"""Tests for the detection box merger (geometry + CSV runner)."""
import numpy as np
import pytest

from glomeruli_segmentation_tpu.pipeline.merge import (
    BoxMerger,
    overlap_area,
    run_merge,
)
from glomeruli_segmentation_tpu.utils.annotation import rect_iou

MPP = 0.25  # µm/px


def rect(x1, y1, x2, y2, conf=1.0):
    return [float(x1), float(y1), float(x2), float(y2), conf,
            float((x2 - x1) * (y2 - y1)), 0.0]


def test_overlap_area():
    assert overlap_area(rect(0, 0, 10, 10), rect(5, 5, 15, 15)) == 25.0
    assert overlap_area(rect(0, 0, 10, 10), rect(20, 20, 30, 30)) == 0.0
    # touching boxes count as zero-area overlap
    assert overlap_area(rect(0, 0, 10, 10), rect(10, 0, 20, 10)) == 0.0


def test_unconditional_merge_of_near_identical_boxes():
    merger = BoxMerger(overlap_threshold=0.35)
    merged = merger.merge_all([rect(0, 0, 100, 100, 0.9),
                               rect(5, 5, 105, 105, 0.95)], MPP, MPP)
    assert len(merged) == 1
    assert merged[0][:4] == [0.0, 0.0, 105.0, 105.0]
    assert merged[0][4] == 0.95  # keeps max confidence


def test_disjoint_boxes_not_merged():
    merger = BoxMerger(overlap_threshold=0.35)
    merged = merger.merge_all([rect(0, 0, 100, 100), rect(500, 500, 600, 600)],
                              MPP, MPP)
    assert len(merged) == 2


def test_oversized_boxes_refused():
    # boxes longer than 350 µm are never merged by the ratio rule
    big = 360.0 / MPP  # px
    merger = BoxMerger(overlap_threshold=0.01)
    a = rect(0, 0, big, 100)
    b = rect(big * 0.7, 10, big * 1.5, 90)
    merged = merger.merge_all([a, b], MPP, MPP)
    assert len(merged) == 2


def test_nearly_equal_side_rule():
    # both x-sides within 30 µm and one y-side matching -> merge regardless
    # of the overlap ratio threshold
    a = rect(0, 0, 400, 400)
    b = rect(8, 4, 408, 700)
    merger = BoxMerger(overlap_threshold=0.99)
    merged = merger.merge_all([a, b], MPP, MPP)
    assert len(merged) == 1
    assert merged[0][:4] == [0.0, 0.0, 408.0, 700.0]


def test_chain_merge_converges():
    # a line of overlapping windows collapses into one box
    boxes = [rect(i * 60, 0, i * 60 + 100, 100, 0.5 + 0.01 * i)
             for i in range(5)]
    merger = BoxMerger(overlap_threshold=0.3)
    merged = merger.merge_all(boxes, MPP, MPP)
    assert len(merged) == 1
    assert merged[0][:4] == [0.0, 0.0, 340.0, 100.0]


def test_merged_boxes_cover_inputs():
    rng = np.random.RandomState(0)
    boxes = []
    for _ in range(40):
        x1 = rng.uniform(0, 2000)
        y1 = rng.uniform(0, 2000)
        w = rng.uniform(40, 400)
        h = rng.uniform(40, 400)
        boxes.append(rect(x1, y1, x1 + w, y1 + h, rng.uniform(0.5, 1.0)))
    merger = BoxMerger(overlap_threshold=0.35)
    merged = merger.merge_all([list(b) for b in boxes], MPP, MPP)
    assert 1 <= len(merged) <= len(boxes)
    for m in merged:
        assert m[2] > m[0] and m[3] > m[1]


def test_run_merge_csv(tmp_path):
    detect_csv = tmp_path / "OPT_PAS_test.csv"
    rows = [
        # site, patient, file, new, ts, x1, y1, x2, y2, conf
        '"S","PAS-001","slide1.PNG",new,2020-01-01T00:00:00,0,0,100,100,0.95',
        '"S","PAS-001","slide1.PNG",new,2020-01-01T00:00:00,5,5,105,105,0.92',
        '"S","PAS-001","slide1.PNG",new,2020-01-01T00:00:00,500,500,600,600,0.91',
        '"S","PAS-001","slide1.PNG",new,2020-01-01T00:00:00,0,0,50,50,0.2',
    ]
    detect_csv.write_text("\n".join(rows) + "\n")
    target_list = tmp_path / "targets.txt"
    target_list.write_text("PAS-001/slide1,10000,8000,40,8.0,0.25,0.25\n")

    merged_path = run_merge("OPT_PAS", str(detect_csv), str(tmp_path), "test",
                            conf_threshold=0.9, annotation_dir=str(tmp_path),
                            overlap_threshold=0.35,
                            target_list=str(target_list))
    lines = open(merged_path).read().strip().splitlines()
    assert len(lines) == 2  # two merged boxes; the 0.2-conf one dropped
    parts = lines[0].split(",")
    assert parts[0] == "S" and parts[1] == "PAS-001"
    assert parts[2] == '"slide1.PNG"'
    assert [int(v) for v in parts[3:7]] == [0, 0, 105, 105]
    assert float(parts[7]) == 0.95
    assert (tmp_path / "OPT_PAS_GlomusMergedList_test_log.csv").exists()


def test_rect_iou():
    assert rect_iou([0, 0, 10, 10], [0, 0, 10, 10]) == 1.0
    assert rect_iou([0, 0, 10, 10], [5, 0, 15, 10]) == pytest.approx(1 / 3)
    assert rect_iou([0, 0, 10, 10], [20, 20, 30, 30]) == 0.0
