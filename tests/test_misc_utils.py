"""Tests for remaining utilities: make_target_list, summary, org_lbl_save,
timing, glomus handler."""
import numpy as np
import pytest

from glomeruli_segmentation_tpu.utils.glomus_handler import (
    GlomusHandler,
    GlomusHandlerException,
)
from glomeruli_segmentation_tpu.utils.summary import model_summary
from glomeruli_segmentation_tpu.utils.timing import StageTimer


def test_make_target_list(tmp_path):
    from glomeruli_segmentation_tpu.cli.make_target_list import main

    (tmp_path / "H16-1" ).mkdir()
    (tmp_path / "H16-1" / "slideA.tiff").write_bytes(b"x")
    base = tmp_path / "base.csv"
    base.write_text("a,b,c,H16-1\n")
    out = tmp_path / "targets.txt"
    main(["--base_list_csv", str(base), "--data_dir", str(tmp_path),
          "--output_file", str(out)])
    assert out.read_text() == "H16-1/slideA\n"


def test_model_summary():
    params = {"encoder": {"level1": {"c": {"conv": {
        "kernel": np.zeros((3, 3, 3, 16))}}}},
        "classifier": {"kernel": np.zeros((2, 2, 5, 5))}}
    text = model_summary(params)
    assert "encoder/level1/c/conv/kernel" in text
    assert f"total parameters: {3*3*3*16 + 2*2*5*5}" in text


def test_org_lbl_save(tmp_path):
    pytest.importorskip("matplotlib")
    from glomeruli_segmentation_tpu.utils.labelme_io import org_lbl_save

    org = np.random.RandomState(0).randint(0, 255, (50, 60, 3)).astype(np.uint8)
    lbl = np.zeros((50, 60), np.uint8)
    lbl[10:30, 10:30] = 1
    out = tmp_path / "dbg.png"
    org_lbl_save(str(out), org, lbl)
    assert out.exists() and out.stat().st_size > 0


def test_stage_timer(tmp_path):
    csv_path = tmp_path / "log.csv"
    jsonl_path = tmp_path / "metrics.jsonl"
    with StageTimer(str(csv_path), str(jsonl_path), stage="detect") as timer:
        with timer.item("slide1.ndpi", windows=42):
            pass
    lines = csv_path.read_text().splitlines()
    assert lines[0] == "file,time"
    assert lines[1].startswith('"slide1.ndpi",')
    import json

    rec = json.loads(jsonl_path.read_text())
    assert rec["stage"] == "detect" and rec["windows"] == 42


def test_glomus_handler_patterns():
    h = GlomusHandler()
    h.set_type("OPT_PAS")
    assert h.repattern.match("H16-123 PAS spare.ndpi")
    assert not h.repattern.match("H16-123 HE.ndpi")
    assert GlomusHandler.get_staining_type("OPT_PAS") == "02_PAS"
    assert GlomusHandler.get_staining_type("OPT_MT") == "05_MT"
    assert GlomusHandler.get_staining_type("UNKNOWN") == ""
    with pytest.raises(GlomusHandlerException):
        h.set_type("BAD")


def test_warmup_cli(reference_models_dir):
    """gseg-warmup precompiles the ensemble programs for the given buckets."""
    from glomeruli_segmentation_tpu.cli.warmup import main

    main(["--segmentation_weights_dir", str(reference_models_dir),
          "--folds", "1", "--seg_batch_size", "2", "--buckets", "256"])


def test_create_dataset_txt_cli(tmp_path):
    """gseg-create-dataset-txt main: pairs rgb with label paths by path
    surgery (ref module/espnet/train/create_dataset_txt.py:6-47)."""
    from glomeruli_segmentation_tpu.cli.create_dataset_txt import main

    for split in ("train", "val"):
        (tmp_path / split / "rgb" / "p1").mkdir(parents=True)
        (tmp_path / split / "label" / "p1").mkdir(parents=True)
        (tmp_path / split / "rgb" / "p1" / "a.PNG").write_bytes(b"x")
    main(["--data_dir", str(tmp_path)])
    for split in ("train", "val"):
        line = (tmp_path / f"{split}.txt").read_text().strip()
        rgb, label = line.split(",")
        assert rgb.endswith(f"{split}/rgb/p1/a.PNG")
        assert label.endswith(f"{split}/label/p1/a.PNG")


def test_train_detector_parser_contract():
    """gseg-train-detector flag surface stays wired to main's dests."""
    from glomeruli_segmentation_tpu.cli.train_detector import build_parser

    args = build_parser().parse_args([
        "--data_dir", "d", "--target_list", "t", "--output_dir", "o",
        "--steps", "5", "--image_size", "128", "--backbone", "tiny"])
    assert (args.data_dir, args.target_list, args.output_dir) == ("d", "t", "o")
    assert args.steps == 5 and args.image_size == 128
    assert args.backbone == "tiny" and args.staining == "OPT_PAS"
