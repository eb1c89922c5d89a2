"""gseg-selftest: the real-artifact acceptance harness, exercised with
synthetic stand-ins (a pyramidal TIFF slide + a tiny-width OD-API .pb
written with the real export's variable layout).  When the real
artifacts appear, the same checks run on them via GSEG_REAL_NDPI /
GSEG_REAL_PB (reference example/README.md:20-38 — both are stripped from
this mirror)."""
import json
import os

import numpy as np
import pytest

from pb_graph_writer import write_graph
from test_od_api_import import build_od_api_consts

from glomeruli_segmentation_tpu.pipeline.selftest import (
    check_ndpi,
    check_pb,
    run_selftest,
)
from glomeruli_segmentation_tpu.wsi.synthetic import (
    pas_like_image,
    write_pyramidal_tiff,
)


@pytest.fixture(scope="module")
def slide_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("selftest") / "s.tiff")
    img, _ = pas_like_image(1024, 1536, seed=3, n_glomeruli=2)
    write_pyramidal_tiff(path, img, mpp=0.25, objective_power=40.0,
                         levels=3)
    return path


@pytest.fixture(scope="module")
def pb_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("selftest_pb")
               / "frozen_inference_graph.pb")
    consts, _, _ = build_od_api_consts()
    write_graph(consts, path)
    return path


def test_check_ndpi_both_readers_agree(slide_path):
    result = check_ndpi(slide_path, region=256)
    assert result["ok"], result
    assert result["dimensions"] == [1536, 1024]
    assert result["level_count"] == 3
    # every level contributed comparison regions with recorded digests
    levels = {r["level"] for r in result["regions"]}
    assert levels == {0, 1, 2}
    assert all(len(r["sha256"]) == 64 for r in result["regions"])
    assert result["decode_errors"] == []
    assert result["pixel_mismatches"] == []


def test_check_ndpi_flags_corrupt_file(tmp_path):
    bad = tmp_path / "bad.tiff"
    bad.write_bytes(b"II*\0" + b"\x99" * 64)
    verdict = run_selftest(ndpi=str(bad))
    assert verdict["checks_run"] == ["ndpi"]
    assert not verdict["ok"]
    assert "error" in verdict["ndpi"]


def test_check_pb_runs_detection_window(pb_path, slide_path):
    result = check_pb(pb_path, slide_path=slide_path, window=256)
    assert result["ok"], result
    assert result["graph_constants"] > 100
    assert result["window_source"] == "slide-center"
    assert result["contract_violations"] == []
    assert len(result["top_detections"]) == 5
    # synthetic-window fallback works too
    result2 = check_pb(pb_path, window=256)
    assert result2["window_source"] == "synthetic"
    assert result2["ok"], result2


def test_selftest_cli_verdict_and_skip(tmp_path, slide_path, pb_path,
                                       capsys):
    from glomeruli_segmentation_tpu.cli.selftest import main

    out = tmp_path / "verdict.json"
    rc = main(["--ndpi", slide_path, "--pb", pb_path, "--out", str(out)])
    assert rc == 0
    verdict = json.load(open(out))
    assert verdict["ok"] and verdict["checks_run"] == ["ndpi", "pb"]
    assert verdict["ndpi"]["ok"] and verdict["pb"]["ok"]

    # graceful skip: no artifacts -> rc 0, both sections marked skipped
    capsys.readouterr()  # drop the first run's output
    rc = main(["--ndpi", "", "--pb", "", "--out", ""])
    assert rc == 0
    printed = json.loads(capsys.readouterr().out)
    assert printed["checks_run"] == []
    assert "skipped" in printed["ndpi"] and "skipped" in printed["pb"]

    # a missing path is a skip, not a failure
    rc = main(["--ndpi", str(tmp_path / "nope.ndpi"), "--out", ""])
    assert rc == 0
