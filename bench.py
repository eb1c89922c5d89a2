"""Benchmark: ESPNet crop-segmentation throughput vs the torch CPU reference.

Prints ONE JSON line of record:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline unit is crops/sec — one "crop" is a full 512x1024 ESPNet
forward + argmax, the hot loop of the reference pipeline
(``module/espnet/test/VisualizeResults_iou.py:100-129``).

Robustness contract (round 4 — the round-3 driver artifact was a timeout
with nothing to parse):

- the headline line is printed + flushed IMMEDIATELY after the headline
  measurement, so a driver timeout at any later point still leaves a
  parseable record in the output tail;
- (round 5) each e2e stage is timed as a MEDIAN OF 3 short reps with
  {median, best, spread} recorded, and ``extra.channel_health`` carries
  an in-process dispatch-floor + h2d-bandwidth probe — the round-4
  driver artifact timed single reps and under-reported e2e ~1.7x on a
  degraded tunnel minute with nothing in the record to show it;
- (round 5) the ~1 Gpx sustained tier appears every round as
  ``extra.sustained_1gpx`` (compact scaled probe, final superseding
  line); the direct measure stays opt-in via ``GSEG_BENCH_LARGE=1``;
- (round 5) a superseding record line is emitted after EVERY stage, and
  the e2e scoreboard stages (detection, fused) get grace past the
  nominal budget: on a slow-recovery tunnel the headline alone can eat
  the budget, and since the driver parses the output tail, each
  completed stage strictly improves the surviving record while a stage
  cut off by the driver's axe costs nothing;
- superseding lines with the e2e extras follow as the wall-clock budget
  allows (``GSEG_BENCH_BUDGET_S``, default 540 s); sub-benches that
  would exceed the budget (plus their grace) are skipped with explicit
  markers;
- the backend probe is bounded at 60 s (an outage fails fast, it does not
  eat the budget);
- the expensive variants (host-resize re-measure, serial stage breakdowns,
  live torch re-measure) run only under ``GSEG_BENCH_FULL=1`` — their
  numbers are recorded in BASELINE.md and change only when the code does.

``vs_baseline`` is pinned to the committed torch-CPU reference denominator
(BASELINE.md "Measured reference denominator": 0.295 s/crop/fold =
3.39 crops/sec on this host) — a live re-measure on this contended
single-core host jittered the ratio +-40% across rounds for an unchanged
numerator.  ``GSEG_BENCH_FULL=1`` additionally reports the live torch
measurement separately as ``extra.live_torch_crops_per_sec``.
"""
from __future__ import annotations

import json
import os
import sys
import time

BATCH = 128  # measured sweet spot on one v5e chip (~1007 crops/s, round 3)
H, W = 512, 1024
WARMUP = 2
ITERS = 3

# committed torch-CPU reference denominator (crops/sec) — BASELINE.md
# round-2 measurement on this host (bench_reference.py): 0.295 s/crop/fold.
BASELINE_CROPS_PER_SEC = 3.39

# measured reference denominators on this host's CPU (bench_reference.py,
# committed in BASELINE.md): composed end-to-end sec/slide for the
# bench_e2e.py synthetic slide (4 windows, 48 crops, 5 folds)
REFERENCE_E2E_SEC_PER_SLIDE = 112.89
REFERENCE_DETECTION_WINDOWS_PER_SEC = 0.095

_T0 = time.monotonic()
# 540 (was 480 in r4): on a degraded-tunnel day the pre-sustained stages
# alone reach ~500 s wall.  Raising the budget is low-risk because every
# emitted line is a COMPLETE record — a driver timeout can only cost the
# last superseding line, never the parseable result (the driver reads
# the output tail).
_BUDGET_S = float(os.environ.get("GSEG_BENCH_BUDGET_S", "540"))
FULL = os.environ.get("GSEG_BENCH_FULL", "") not in ("", "0")


def _remaining() -> float:
    return _BUDGET_S - (time.monotonic() - _T0)


def bench_ours() -> float:
    import jax
    import jax.numpy as jnp

    from glomeruli_segmentation_tpu.models.espnet import ESPNet

    rng = jax.random.key(0)
    x = jax.random.uniform(rng, (BATCH, H, W, 3), jnp.float32)

    fold1 = "/root/reference/models/espnet_fold1.pth"
    on_tpu = jax.devices()[0].platform != "cpu"
    if on_tpu and os.path.isfile(fold1):
        # production fast path: Pallas-fused ESP blocks, bf16 compute
        from glomeruli_segmentation_tpu.convert.espnet_import import (
            load_espnet_variables,
        )
        from glomeruli_segmentation_tpu.models.espnet_fused import (
            FusedESPNet,
        )

        # batch 128 sits past the measured level-3 kernel crossover
        # (BASELINE.md round 3): XLA's folded-BN path wins there
        fused = FusedESPNet(load_espnet_variables(fold1),
                            fuse_level3=BATCH < 96)

        @jax.jit
        def forward(batch):
            # reduce to a scalar: jax.block_until_ready can silently
            # no-op on the axon backend (CLAUDE.md), so the timing loop
            # syncs via a host read of the reduced result instead
            return jnp.argmax(fused(batch.astype(jnp.bfloat16)),
                              axis=-1).sum()

        call = lambda: float(forward(x))
    else:
        # dtype threads real bf16 compute (input-only casts promote back
        # to f32 at the first f32-param conv)
        model = ESPNet(classes=5, p=2, q=8, dtype=jnp.bfloat16)
        variables = model.init(jax.random.key(1), x[:1])

        @jax.jit
        def forward(v, batch):
            logits = model.apply(v, batch)
            return jnp.argmax(logits, axis=-1).sum()

        call = lambda: float(forward(variables, x))

    call()
    for _ in range(WARMUP):
        call()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        call()
    dt = time.perf_counter() - t0
    return BATCH * ITERS / dt


def bench_torch_reference() -> float | None:
    """Live torch-CPU re-measure (GSEG_BENCH_FULL only — reported
    separately, never the ``vs_baseline`` denominator)."""
    ref_dir = "/root/reference/module/espnet/train"
    if not os.path.isdir(ref_dir):
        return None
    try:
        import torch
    except ImportError:
        return None
    sys.path.insert(0, ref_dir)
    try:
        import Model as RefNet
    finally:
        sys.path.pop(0)
    model = RefNet.ESPNet(classes=5, p=2, q=8)
    model.eval()
    x = torch.randn(1, 3, H, W)
    iters = 3
    with torch.no_grad():
        model(x)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            out = model(x)
            _ = out.max(1)[1].byte().numpy()
        dt = time.perf_counter() - t0
    return iters / dt


def _slide_fixture():
    """Build (once, /tmp-cached) the synthetic bench slide."""
    import numpy as np

    import bench_e2e

    tmp = os.path.join("/tmp", "gseg_bench_slide.tiff")
    centers_file = tmp + ".centers.npy"
    if not os.path.isfile(tmp) or not os.path.isfile(centers_file):
        centers = bench_e2e.make_slide(tmp)
        np.save(centers_file, np.asarray(centers))
    return tmp, np.load(centers_file)


def bench_sustained_extra(det: dict | None) -> dict:
    """The ~1 Gpx sustained-tier probe, run LAST behind its own emit:
    its first-ever run may pay fresh remote-AOT compiles for the
    300-1000 px shape buckets, and the main e2e record must already be
    on stdout before that risk is taken."""
    import bench_e2e

    import numpy as np

    tmp, centers = _slide_fixture()
    # prefer the cached 1 Gpx slide (bench_e2e.py --large builds it once
    # under /tmp): crop reads then pay the real large-slide decode cost
    # instead of the toy slide's
    dims = (bench_e2e.SLIDE_W, bench_e2e.SLIDE_H)
    large = os.path.join("/tmp", "gseg_bench_slide_large.tiff")
    if os.path.isfile(large) and os.path.isfile(large + ".centers.npy"):
        tmp = large
        centers = np.load(large + ".centers.npy")
        n = bench_e2e.LARGE_REGION * bench_e2e.LARGE_GRID
        dims = (n, n)
    # always run (like the detection/fused scoreboard stages): warm, the
    # probe costs ~15-25 s (it reuses the fused bench's segmenter,
    # bench_e2e._FUSED_CACHE) and its line supersedes an already-flushed
    # record — it is the VERDICT-mandated per-round sustained number and
    # attempting it past budget risks nothing
    if True:
        try:
            return bench_e2e.bench_sustained_compact(tmp, centers,
                                                     detection=det,
                                                     slide_dims=dims)
        except Exception as e:
            return {"error": repr(e)}
    return {"skipped": "budget"}


def _stage(extra: dict, name: str, fn, min_remaining: float):
    """Run one sub-bench and fold its skip/error markers into ``extra``.

    ``min_remaining``: the stage starts only when more than this much
    budget is left — NEGATIVE values grant grace past the nominal budget
    (the e2e scoreboard stages get deep grace: on a slow-recovery tunnel
    the headline alone can eat the whole budget, and a stage that runs
    past the driver's axe costs nothing because the previously flushed
    record line still stands)."""
    if _remaining() > min_remaining:
        try:
            result = fn()
        except Exception as e:
            result = {"error": repr(e)}
    else:
        result = {"skipped": "budget"}
    if "skipped" in result:
        extra[f"{name}_skipped"] = result["skipped"]
    if "error" in result:
        extra[f"{name}_error"] = result["error"]
    extra["wall_s"] = round(time.monotonic() - _T0, 1)
    return result


def bench_e2e_stages(record: dict) -> dict:
    """Whole-slide numbers (bench_e2e.py stages) folded into the bench
    artifact incrementally: after every stage a superseding line goes to
    stdout, so the record degrades stage-by-stage instead of all-or-
    nothing (two measured slow-recovery runs lost ALL extras when the
    headline ate the budget)."""
    import bench_e2e

    tmp, centers = _slide_fixture()
    extra: dict = {}

    # channel health first: cheap, and even a headline-only record then
    # shows the tunnel state (VERDICT r4 weak 1)
    try:
        extra["channel_health"] = bench_e2e.channel_health()
    except Exception as e:
        extra["channel_health"] = {"error": repr(e)}
    _emit(dict(record, extra=dict(extra)))

    # the scoreboard stages ALWAYS run: with lines flushed per stage,
    # attempting them past the budget can only add to the surviving
    # record (worst case the driver's axe falls mid-stage and the
    # previous line stands)
    det = _stage(extra, "detection",
                 lambda: bench_e2e.bench_detection(tmp, full=FULL),
                 min_remaining=-(10 ** 9))
    extra.update({
        "detection_windows_per_sec": det.get("windows_per_sec"),
        "detection_sec_per_slide": det.get("sec_per_slide"),
        "detection_sec_stats": det.get("sec_per_slide_stats"),
    })
    if FULL:
        extra["detection_breakdown"] = det.get("breakdown")
    _emit(dict(record, extra=dict(extra)))

    seg = _stage(extra, "fused",
                 lambda: bench_e2e.bench_fused_segmentation(tmp, centers,
                                                            full=FULL),
                 min_remaining=-(10 ** 9))
    extra.update({
        "fused_5fold_sec_per_slide": seg.get("sec_per_slide"),
        "fused_5fold_sec_stats": seg.get("sec_per_slide_stats"),
        "fused_5fold_crops_per_sec": seg.get("crops_per_sec"),
        "fused_engine": seg.get("engine"),
    })
    if FULL:
        extra["fused_breakdown"] = seg.get("breakdown")
        extra["fused_5fold_sec_per_slide_host_resize"] = seg.get(
            "sec_per_slide_host_resize")
        extra["fused_5fold_crops_per_sec_host_resize"] = seg.get(
            "crops_per_sec_host_resize")
    if det.get("sec_per_slide") and seg.get("sec_per_slide"):
        # e2e composes detection + the faster of the two fused variants
        seg_best = min(seg["sec_per_slide"],
                       seg.get("sec_per_slide_host_resize")
                       or seg["sec_per_slide"])
        e2e = det["sec_per_slide"] + seg_best
        extra["e2e_sec_per_slide"] = round(e2e, 3)
        extra["e2e_slides_per_hour"] = round(3600.0 / e2e, 1)
        extra["e2e_vs_reference_cpu"] = round(
            REFERENCE_E2E_SEC_PER_SLIDE / e2e, 1)
    _emit(dict(record, extra=dict(extra)))

    sf = _stage(extra, "segformer",
                lambda: bench_e2e.bench_segformer(), min_remaining=90)
    extra["segformer_crops_per_sec"] = sf.get("crops_per_sec")
    _emit(dict(record, extra=dict(extra)))
    extra["_detection_record"] = det  # consumed by bench_sustained_extra
    return extra


def _probe_backend(timeout_s: int = 60) -> None:
    """Fail fast (non-zero exit) when the TPU backend is unreachable.

    ``jax.devices()`` on the axon tunnel blocks indefinitely during an
    outage; a bench run must produce a bounded, explicit failure instead
    of hanging the driver.  The probe runs in a subprocess so the main
    process never touches a dead backend.  60 s: a healthy tunnel answers
    in ~10 s; a longer timeout only eats the bench budget during outages."""
    effective = (os.environ.get("GSEG_PLATFORM")
                 or os.environ.get("JAX_PLATFORMS", "")).lower()
    if effective == "cpu":
        return  # CPU runs initialize locally; nothing to probe
    import subprocess

    try:
        # mirror the bench's own init: importing the package applies the
        # GSEG_PLATFORM override before the first device use, so the
        # probe exercises the backend the bench will actually run on
        r = subprocess.run(
            [sys.executable, "-c",
             "import glomeruli_segmentation_tpu, jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        ok = r.returncode == 0
        detail = (r.stderr or b"").decode(errors="replace")[-400:]
    except subprocess.TimeoutExpired:
        ok, detail = False, f"device init exceeded {timeout_s}s"
    if not ok:
        print(json.dumps({"error": "TPU backend unreachable; bench "
                                   "not run", "detail": detail}))
        sys.exit(2)


def _emit(record: dict) -> None:
    print(json.dumps(record))
    sys.stdout.flush()


def main():
    _probe_backend()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    # liveness line BEFORE the headline: the backend's init/compile path
    # has measured multi-minute stalls in degraded states (a headline
    # took 1086 s on 2026-08-21 with healthy steady-state transfers) —
    # if the driver's axe lands mid-headline, this line makes the
    # failure diagnosable instead of leaving nothing to parse.  value 0
    # = "no measurement yet", never a real throughput.
    _emit({"metric": "espnet_crop_segmentation_throughput", "value": 0.0,
           "unit": "crops/sec", "vs_baseline": 0.0,
           "extra": {"partial": "backend probe passed; headline "
                                "measuring — if this is the last line, "
                                "the backend compile/init path stalled "
                                "mid-measurement (known degraded-state "
                                "behavior, BASELINE.md)"}})
    ours = bench_ours()
    record = {
        "metric": "espnet_crop_segmentation_throughput",
        "value": round(ours, 3),
        "unit": "crops/sec",
        "vs_baseline": round(ours / BASELINE_CROPS_PER_SEC, 3),
    }
    # flush the headline NOW: any later timeout/crash still leaves a
    # parseable record in the output tail (round-3 driver artifact was
    # rc=124 with nothing emitted)
    _emit(dict(record, extra={"partial": "headline only; extras follow"}))
    try:
        extra = bench_e2e_stages(record)
    except Exception as e:  # the headline metric must survive e2e failures
        extra = {"error": repr(e)}
    if FULL and _remaining() > 60:
        try:
            live = bench_torch_reference()
        except Exception:
            live = None
        if live:
            extra["live_torch_crops_per_sec"] = round(live, 3)
            extra["vs_live_torch"] = round(ours / live, 3)
    if os.environ.get("GSEG_BENCH_LARGE", "") not in ("", "0"):
        # ~1 Gpx sustained tier, measured directly: explicit opt-in only
        # (slide build ~3 min one-time + cold program compiles through
        # the remote AOT service)
        import bench_e2e

        try:
            extra["large_slide"] = bench_e2e.run_large()
        except Exception as e:
            extra["large_slide"] = {"error": repr(e)}
    det_rec = extra.pop("_detection_record", None)
    extra["wall_s"] = round(time.monotonic() - _T0, 1)
    # supersedes the early headline line (same headline numbers)
    _emit(dict(record, extra=extra))
    # sustained ~1 Gpx tier, scaled from a compact probe (VERDICT r4
    # weak 6: the 33x-tier number must appear in the per-round record).
    # Emitted as a FINAL superseding line: its first-ever run may pay
    # fresh shape-bucket compiles, and the record above must already be
    # parseable if that runs long.
    try:
        extra["sustained_1gpx"] = bench_sustained_extra(det_rec)
    except Exception as e:
        extra["sustained_1gpx"] = {"error": repr(e)}
    extra["wall_s"] = round(time.monotonic() - _T0, 1)
    _emit(dict(record, extra=extra))


if __name__ == "__main__":
    main()
