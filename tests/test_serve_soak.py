"""Residency soak: the resident server must not accumulate memory,
compiled programs, or file descriptors across many tickets.

The reference's process-per-stage design (example/README.md:27-133)
trivially cannot leak — every stage's resources die with its process.
The resident rebuild (``gseg-serve``) keeps one process and its warm
programs alive across tickets, so equivalence must be proven: ~40
tickets with varied crop populations, window geometries, duplicate
patients and interleaved failing tickets, asserting host RSS plateaus,
the compiled-program count stabilizes at the shape-bucket bound, fd
count stays flat, and the spool lifecycle stays consistent
(VERDICT r4 weak 4).  The opt-in TPU-scale variant is ``bench_soak.py``.
"""
import gc
import json
import os

import pytest

from test_detect_stage import MPP, BlobBackend
from test_serve import _drop_ticket, _pipe

from glomeruli_segmentation_tpu.pipeline.e2e import FusedEndToEnd
from glomeruli_segmentation_tpu.pipeline.fused import (
    EnsembleConfig,
    EnsembleSegmenter,
)
from glomeruli_segmentation_tpu.pipeline.serve import SlideServer
from glomeruli_segmentation_tpu.wsi.synthetic import (
    pas_like_image,
    write_pyramidal_tiff,
)

JIT_ATTRS = ("_forward", "_forward_flat", "_forward_gather",
             "_forward_gather_flat", "_forward_resized",
             "_forward_gather_resized")


def _program_count(ensemble) -> int:
    total = 0
    for name in JIT_ATTRS:
        fn = getattr(ensemble, name, None)
        if fn is not None and hasattr(fn, "_cache_size"):
            total += fn._cache_size()
    return total


def _rss_kb() -> int:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1])
    raise RuntimeError("no VmRSS")


def _fd_count() -> int:
    return len(os.listdir("/proc/self/fd"))


def _make_varied_slides(tmp_path, n=6):
    """n slides with distinct geometries and crop populations: varied
    window grids (slide dims), crop-size buckets (glomerulus radii), and
    crop counts."""
    dims = [(768, 1024), (1024, 1536), (896, 1280),
            (1280, 1792), (1536, 2048), (640, 896)]
    slides = []
    for i in range(n):
        h, w = dims[i % len(dims)]
        img, _ = pas_like_image(h, w, seed=100 + i,
                                n_glomeruli=2 + (i % 4))
        slide_dir = tmp_path / "slides" / f"s{i}"
        slide_dir.mkdir(parents=True)
        path = slide_dir / f"s{i}.tiff"
        write_pyramidal_tiff(str(path), img, mpp=MPP,
                             objective_power=40.0, levels=3)
        slides.append(path)
    return slides


@pytest.mark.slow
def test_serve_soak_resources_plateau(tmp_path, reference_models_dir):
    slides = _make_varied_slides(tmp_path)
    served = tmp_path / "served"
    spool = tmp_path / "spool"

    ckpts = [str(reference_models_dir / "espnet_fold1.pth"),
             str(reference_models_dir / "espnet_fold2.pth")]
    ensemble = EnsembleSegmenter(EnsembleConfig(
        checkpoints=ckpts, folds=(1, 2), batch_size=2,
        compute_dtype="float32", precision="highest"))
    pipe = FusedEndToEnd(BlobBackend(), ensemble, window_size=100,
                         overlap_ratio=0.5, detect_conf=0.5,
                         merge_conf=0.9, merge_overlap=0.35)
    server = SlideServer(pipe, str(spool), str(served),
                         json_dir=str(served / "json"),
                         poll_interval=0.05, wave_size=4)

    n_batches = 10
    per_batch = 4
    rss, programs, fds = [], [], []
    ticket_no = 0
    done_expected = failed_expected = skip_expected = 0
    first_patient = None
    for b in range(n_batches):
        for k in range(per_batch):
            ticket_no += 1
            name = f"job{ticket_no:03d}.json"
            kind = ticket_no % 8
            if kind == 5:
                # failing ticket: missing slide file
                _drop_ticket(spool, name, tmp_path / "missing.tiff",
                             f"GHOST-{ticket_no}")
                failed_expected += 1
            elif kind == 6:
                # corrupt ticket JSON
                os.makedirs(spool, exist_ok=True)
                (spool / name).write_text("{not json")
                failed_expected += 1
            elif kind == 7 and first_patient is not None:
                # duplicate patient: skip-already-done path
                _drop_ticket(spool, name, slides[0], first_patient)
                skip_expected += 1
            else:
                # real work: unique patient alias onto a varied slide
                slide = slides[ticket_no % len(slides)]
                patient = f"SOAK-{ticket_no:03d}"
                if first_patient is None:
                    first_patient = patient
                _drop_ticket(spool, name, slide, patient)
                done_expected += 1
        assert server.serve(max_slides=per_batch) == per_batch
        gc.collect()
        rss.append(_rss_kb())
        programs.append(_program_count(ensemble))
        fds.append(_fd_count())

    assert ticket_no == 40

    # spool lifecycle: nothing stranded, every ticket accounted for
    assert not [f for f in os.listdir(spool) if f.endswith(".json")]
    assert not os.listdir(spool / "active")
    assert len(os.listdir(spool / "done")) == done_expected + skip_expected
    assert len(os.listdir(spool / "failed")) == failed_expected

    # status stream agrees
    rows = [json.loads(line) for line in
            (served / "serve_log.jsonl").read_text().splitlines()]
    from collections import Counter

    counts = Counter(r["status"] for r in rows)
    assert counts["done"] == done_expected
    assert counts["failed"] == failed_expected
    assert counts["skipped_already_done"] == skip_expected

    # compiled programs stabilize: every geometry recurs after the first
    # pass over the slide set, so the second half must add NO programs
    assert programs[-1] == programs[len(programs) // 2], programs
    # shape-bucket bound: documented ~9 flat-bucket programs per padded
    # shape x geometries; with 6 slide geometries and 2-px batches this
    # stays far below the bound where every ticket adds a program
    assert programs[-1] < 40, programs

    # fd count flat (the log file handle is per-write)
    assert fds[-1] - fds[0] <= 4, fds

    # RSS plateaus: growth over the last 10 tickets < 5%
    assert rss[-1] <= rss[-3] * 1.05, rss
    # and the second half of the soak adds < 10% overall
    assert rss[-1] <= rss[len(rss) // 2] * 1.10, rss
