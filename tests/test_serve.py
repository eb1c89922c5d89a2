"""Resident serving loop: ticket lifecycle, artifact parity with
gseg-e2e, error isolation, stop/skip semantics."""
import glob
import json
import os

import numpy as np
import pytest

from test_detect_stage import BlobBackend
from test_e2e_fused import _make_slide

from glomeruli_segmentation_tpu.pipeline.e2e import FusedEndToEnd
from glomeruli_segmentation_tpu.pipeline.fused import (
    EnsembleConfig,
    EnsembleSegmenter,
)
from glomeruli_segmentation_tpu.pipeline.serve import SlideServer


def _pipe(reference_models_dir):
    ckpts = [str(reference_models_dir / "espnet_fold1.pth")]
    ensemble = EnsembleSegmenter(EnsembleConfig(
        checkpoints=ckpts, folds=(1,), batch_size=2,
        compute_dtype="float32", precision="highest"))
    return FusedEndToEnd(BlobBackend(), ensemble, window_size=100,
                         overlap_ratio=0.5, detect_conf=0.5, merge_conf=0.9,
                         merge_overlap=0.35)


def _drop_ticket(spool, name, slide_path, patient_id):
    os.makedirs(spool, exist_ok=True)
    with open(os.path.join(spool, name), "w") as f:
        json.dump({"slide_path": str(slide_path),
                   "patient_id": patient_id}, f)


@pytest.mark.slow
def test_serve_matches_direct_e2e(tmp_path, reference_models_dir):
    slide1, _, p1 = _make_slide(tmp_path, patient="H16-10001")
    slide2, _, p2 = _make_slide(tmp_path, patient="H16-10002")

    # direct gseg-e2e path: two slides accumulated into one output dir
    pipe = _pipe(reference_models_dir)
    direct = tmp_path / "direct"
    FusedEndToEnd.prepare_output(str(direct), "OPT_PAS")
    for path, pid in ((slide1, p1), (slide2, p2)):
        pipe.run_slide(str(path), str(direct), pid,
                       json_dir=str(direct / "json"))

    # served path: same pipeline object semantics, tickets through a spool
    served = tmp_path / "served"
    spool = tmp_path / "spool"
    _drop_ticket(spool, "job1.json", slide1, p1)
    _drop_ticket(spool, "job2.json", slide2, p2)
    server = SlideServer(_pipe(reference_models_dir), str(spool),
                         str(served), json_dir=str(served / "json"))
    n = server.serve(max_slides=2)
    assert n == 2

    # ticket lifecycle: both in done/, spool drained
    assert sorted(os.listdir(spool / "done")) == ["job1.json", "job2.json"]
    assert not [f for f in os.listdir(spool) if f.endswith(".json")]

    # the public artifacts match the direct run byte-for-byte
    csv = "OPT_PAS_GlomusMergedList_.csv"
    assert (served / csv).read_text() == (direct / csv).read_text()
    for pid in (p1, p2):
        d_jsons = sorted(glob.glob(str(direct / "json" / pid / "*.json")))
        s_jsons = sorted(glob.glob(str(served / "json" / pid / "*.json")))
        assert [os.path.basename(p) for p in d_jsons] == \
               [os.path.basename(p) for p in s_jsons] and d_jsons
        for dj, sj in zip(d_jsons, s_jsons):
            assert open(dj).read() == open(sj).read()
        d_img = np.fromfile(str(direct / f"{pid}_pred.jpg"), np.uint8)
        s_img = np.fromfile(str(served / f"{pid}_pred.jpg"), np.uint8)
        assert np.array_equal(d_img, s_img)

    # status stream: one 'done' row per ticket, in submission order
    rows = [json.loads(line)
            for line in (served / "serve_log.jsonl").read_text().splitlines()]
    assert [r["status"] for r in rows] == ["done", "done"]
    assert [r["patient_id"] for r in rows] == [p1, p2]


@pytest.mark.slow
def test_serve_error_isolation_and_skip(tmp_path, reference_models_dir):
    slide, _, pid = _make_slide(tmp_path, patient="H16-10003")
    served = tmp_path / "served"
    spool = tmp_path / "spool"
    # job1 points at a slide that does not exist; job2 is valid
    _drop_ticket(spool, "job1.json", tmp_path / "missing.tiff", "GHOST")
    _drop_ticket(spool, "job2.json", slide, pid)
    server = SlideServer(_pipe(reference_models_dir), str(spool),
                         str(served), write_overlay=False)
    assert server.serve(max_slides=2) == 2

    # the bad ticket landed in failed/ with the error recorded, and did
    # not take the server down before job2
    failed = json.load(open(spool / "failed" / "job1.json"))
    assert "error" in failed
    assert os.path.isfile(spool / "done" / "job2.json")
    rows = [json.loads(line)
            for line in (served / "serve_log.jsonl").read_text().splitlines()]
    assert [r["status"] for r in rows] == ["failed", "done"]

    # re-submitting a completed slide is skipped (its merged-CSV rows
    # would duplicate otherwise) — a fresh server instance must learn
    # completedness from the timing log on disk, not process memory
    csv = (served / "OPT_PAS_GlomusMergedList_.csv").read_text()
    _drop_ticket(spool, "job3.json", slide, pid)
    server2 = SlideServer(_pipe(reference_models_dir), str(spool),
                          str(served), write_overlay=False)
    assert server2.serve(max_slides=1) == 1
    assert (served / "OPT_PAS_GlomusMergedList_.csv").read_text() == csv
    rows = [json.loads(line)
            for line in (served / "serve_log.jsonl").read_text().splitlines()]
    assert rows[-1]["status"] == "skipped_already_done"


def test_serve_stop_file_and_claim_recovery(tmp_path, reference_models_dir):
    spool = tmp_path / "spool"
    served = tmp_path / "served"
    os.makedirs(spool)
    (spool / "STOP").touch()
    server = SlideServer(_pipe(reference_models_dir), str(spool),
                         str(served))
    assert server.serve() == 0

    # a ticket stranded in active/ by a crash is recovered on startup
    (spool / "active").mkdir(exist_ok=True)
    with open(spool / "active" / "stale.json", "w") as f:
        json.dump({"slide_path": "/nope"}, f)
    server2 = SlideServer(_pipe(reference_models_dir), str(spool),
                          str(served))
    assert os.path.isfile(spool / "stale.json")
    assert server2.scan() == [str(spool / "stale.json")]


class _StubPipe:
    """Spool-mechanics-only stand-in (no model, no slide IO)."""
    data_category = "OPT_PAS"

    def run_slide(self, slide_path, output_dir, patient_id, json_dir=None,
                  write_overlay=True):
        return None


def test_serve_multi_server_shared_spool(tmp_path):
    """Two servers on one spool: claims are namespaced per server, a
    restart recovers only its own stale claims, and losing the claim
    race is a silent skip — the multi-host scale-out contract."""
    spool = tmp_path / "spool"
    out_a, out_b = tmp_path / "a", tmp_path / "b"
    os.makedirs(spool)
    a = SlideServer(_StubPipe(), str(spool), str(out_a), server_id="hostA")
    b = SlideServer(_StubPipe(), str(spool), str(out_b), server_id="hostB")

    _drop_ticket(str(spool), "t1.json", "/nonexistent.tif", "P1")
    path = os.path.join(str(spool), "t1.json")
    # A claims (simulated mid-flight: claimed but not yet processed)
    os.replace(path, os.path.join(a.active_dir, "hostA__t1.json"))
    # B loses the race on the now-gone spool path: skip, not an error
    assert b.process_ticket(path) is None

    # B restarting must NOT steal A's in-flight claim
    b2 = SlideServer(_StubPipe(), str(spool), str(out_b), server_id="hostB")
    assert os.path.isfile(os.path.join(a.active_dir, "hostA__t1.json"))
    assert b2.scan() == []

    # A restarting DOES recover its own stale claim, un-namespaced
    a2 = SlideServer(_StubPipe(), str(spool), str(out_a), server_id="hostA")
    assert a2.scan() == [path]

    # the processed ticket lands in done/ under its original name
    row = a2.process_ticket(path)
    assert row["status"] == "done"
    assert os.path.isfile(spool / "done" / "t1.json")
    assert not os.listdir(spool / "active")

    # the separator is reserved
    with pytest.raises(ValueError):
        SlideServer(_StubPipe(), str(spool), str(out_a), server_id="x__y")


def test_serve_cli_parser_surface():
    from glomeruli_segmentation_tpu.cli.serve import build_parser

    parser = build_parser()
    args = parser.parse_args([
        "--model", "/m", "--segmentation_weights_dir", "/w",
        "--spool_dir", "/spool", "--output_dir", "/out",
        "--max_slides", "3", "--no_overlay"])
    assert args.spool_dir == "/spool" and args.max_slides == 3
    assert args.engine == "auto" and args.no_overlay
    # batch-run inputs are replaced by the spool
    with pytest.raises(SystemExit):
        parser.parse_args(["--model", "/m", "--segmentation_weights_dir",
                           "/w", "--spool_dir", "/s", "--target_list", "/t"])


@pytest.mark.slow
def test_serve_duplicate_patient_in_one_wave(tmp_path, reference_models_dir):
    """Two tickets for the same patient submitted together: the wave path
    must not run the slide twice (the serial loop learned completedness
    between tickets; the wave defers the duplicate to the next wave,
    which takes the skip-already-done path)."""
    slide, _, pid = _make_slide(tmp_path, patient="H16-10004")
    served = tmp_path / "served"
    spool = tmp_path / "spool"
    _drop_ticket(spool, "job1.json", slide, pid)
    _drop_ticket(spool, "job2.json", slide, pid)
    server = SlideServer(_pipe(reference_models_dir), str(spool),
                         str(served), write_overlay=False)
    assert server.serve(max_slides=2) == 2
    rows = [json.loads(line)
            for line in (served / "serve_log.jsonl").read_text().splitlines()]
    assert sorted(r["status"] for r in rows) == \
        ["done", "skipped_already_done"]
    # the merged CSV holds the slide's rows exactly once
    csv = (served / "OPT_PAS_GlomusMergedList_.csv").read_text()
    lines = [l for l in csv.splitlines() if l.strip()]
    assert len(lines) == len(set(lines)) and lines
    assert sorted(os.listdir(spool / "done")) == ["job1.json", "job2.json"]


def test_serve_recycle_rss_bound(tmp_path):
    """Bounded-memory residency (round 5): when host RSS crosses the
    bound, serve() returns early with recycle_requested so the CLI can
    re-exec — but never before the first ticket (progress guarantee),
    and a fresh server finishes the remainder (the restart contract)."""
    spool = tmp_path / "spool"
    out = tmp_path / "out"
    os.makedirs(spool)
    for i in range(3):
        _drop_ticket(str(spool), f"t{i}.json", f"/s{i}.tif", f"P{i}")

    # 1 MB bound: far below any python baseline, so the bound is already
    # crossed — yet the first ticket must still process
    server = SlideServer(_StubPipe(), str(spool), str(out),
                         recycle_rss_mb=1)
    n = server.serve(max_slides=3)
    assert n >= 1 and server.recycle_requested
    remaining = [f for f in os.listdir(spool) if f.endswith(".json")]
    assert len(remaining) == 3 - n

    # the "re-exec" chain: each crossed-bound process still makes
    # progress, so restarting servers drain the spool
    total = n
    while total < 3:
        s = SlideServer(_StubPipe(), str(spool), str(out),
                        recycle_rss_mb=1)
        got = s.serve(max_slides=3 - total)
        assert got >= 1  # progress guarantee per process
        total += got
    assert total == 3
    assert not [f for f in os.listdir(spool) if f.endswith(".json")]

    # a generous bound never trips
    _drop_ticket(str(spool), "t9.json", "/s9.tif", "P9")
    server3 = SlideServer(_StubPipe(), str(spool), str(out),
                          recycle_rss_mb=10**6)
    assert server3.serve(max_slides=1) == 1
    assert not server3.recycle_requested


def test_serve_recycle_cli_wiring():
    from glomeruli_segmentation_tpu.cli.serve import (
        _argv_with_max_slides,
        build_parser,
    )

    args = build_parser().parse_args([
        "--model", "/m", "--segmentation_weights_dir", "/w",
        "--spool_dir", "/s", "--output_dir", "/o",
        "--recycle_rss_mb", "4096"])
    assert args.recycle_rss_mb == 4096
    assert build_parser().parse_args(
        ["--model", "/m", "--segmentation_weights_dir", "/w",
         "--spool_dir", "/s", "--output_dir", "/o"]).recycle_rss_mb is None

    # bounded runs stay bounded across restarts
    argv = ["--model", "/m", "--max_slides", "10", "--spool_dir", "/s"]
    assert _argv_with_max_slides(argv, 7) == [
        "--model", "/m", "--spool_dir", "/s", "--max_slides", "7"]
    argv = ["--max_slides=10", "--spool_dir", "/s"]
    assert _argv_with_max_slides(argv, 3) == [
        "--spool_dir", "/s", "--max_slides", "3"]
