"""Benchmark: ESPNet crop-segmentation throughput vs the torch CPU reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline unit is crops/sec — one "crop" is a full 512x1024 ESPNet
forward + argmax, the hot loop of the reference pipeline
(``module/espnet/test/VisualizeResults_iou.py:100-129``).  ``vs_baseline``
is measured against the torch-CPU reference model run on this same host
(the reference ships no numbers — BASELINE.md), falling back to a recorded
constant when torch or the reference tree is unavailable.
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

# torch-CPU reference throughput measured on the dev host (crops/sec);
# used only when the live baseline measurement is unavailable.
FALLBACK_BASELINE_CROPS_PER_SEC = 0.55

# measured reference denominators on this host's CPU (bench_reference.py,
# committed in BASELINE.md): composed end-to-end sec/slide for the
# bench_e2e.py synthetic slide (4 windows, 48 crops, 5 folds)
REFERENCE_E2E_SEC_PER_SLIDE = 112.89
REFERENCE_DETECTION_WINDOWS_PER_SEC = 0.095


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
    ref_dir = "/root/reference/module/espnet/train"
    if not os.path.isdir(ref_dir):
        return None
    try:
        import numpy as np
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


def bench_e2e_extra() -> dict:
    """Whole-slide numbers (bench_e2e.py stages) folded into the bench
    artifact: sec/slide + slides/hour vs the measured torch-CPU reference
    denominator (bench_reference.py, BASELINE.md)."""
    import bench_e2e

    tmp = os.path.join("/tmp", "gseg_bench_slide.tiff")
    centers_file = tmp + ".centers.npy"
    import numpy as np

    if not os.path.isfile(tmp) or not os.path.isfile(centers_file):
        centers = bench_e2e.make_slide(tmp)
        np.save(centers_file, np.asarray(centers))
    centers = np.load(centers_file)
    # each sub-bench is independently guarded: a failure in one stage
    # must not blank the others' numbers in the driver artifact
    try:
        det = bench_e2e.bench_detection(tmp)
    except Exception as e:
        det = {"error": repr(e)}
    try:
        seg = bench_e2e.bench_fused_segmentation(tmp, centers)
    except Exception as e:
        seg = {"error": repr(e)}
    try:
        sf = bench_e2e.bench_segformer()
    except Exception:
        sf = {}
    extra = {
        "detection_windows_per_sec": det.get("windows_per_sec"),
        "detection_sec_per_slide": det.get("sec_per_slide"),
        "detection_breakdown": det.get("breakdown"),
        "fused_5fold_sec_per_slide": seg.get("sec_per_slide"),
        "fused_5fold_crops_per_sec": seg.get("crops_per_sec"),
        "fused_5fold_sec_per_slide_host_resize":
            seg.get("sec_per_slide_host_resize"),
        "fused_5fold_crops_per_sec_host_resize":
            seg.get("crops_per_sec_host_resize"),
        "fused_engine": seg.get("engine"),
        "fused_breakdown": seg.get("breakdown"),
        "segformer_crops_per_sec": sf.get("crops_per_sec"),
    }
    for key, d in (("detection_error", det), ("fused_error", seg)):
        if "error" in d:
            extra[key] = d["error"]
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
    return extra


def _probe_backend(timeout_s: int = 300) -> None:
    """Fail fast (non-zero exit) when the TPU backend is unreachable.

    ``jax.devices()`` on the axon tunnel blocks indefinitely during an
    outage; a bench run must produce a bounded, explicit failure instead
    of hanging the driver.  The probe runs in a subprocess so the main
    process never touches a dead backend."""
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


def main():
    _probe_backend()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    ours = bench_ours()
    baseline = None
    try:
        baseline = bench_torch_reference()
    except Exception:
        baseline = None
    if baseline is None:
        baseline = FALLBACK_BASELINE_CROPS_PER_SEC
    try:
        extra = bench_e2e_extra()
    except Exception as e:  # the headline metric must survive e2e failures
        extra = {"error": repr(e)}
    print(json.dumps({
        "metric": "espnet_crop_segmentation_throughput",
        "value": round(ours, 3),
        "unit": "crops/sec",
        "vs_baseline": round(ours / baseline, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
