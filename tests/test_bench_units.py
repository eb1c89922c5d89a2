"""Units for the bench-record math (round 5): the driver artifact is the
round's scoreboard, so the median/spread treatment and the sustained-tier
scaling must be correct independent of TPU access."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench_e2e


def test_rep_stats_odd():
    s = bench_e2e._rep_stats([0.3, 0.1, 0.2])
    assert s == {"median": 0.2, "best": 0.1, "spread": 0.2, "reps": 3}


def test_rep_stats_even():
    s = bench_e2e._rep_stats([0.4, 0.1, 0.2, 0.3])
    assert s["median"] == 0.25
    assert s["best"] == 0.1
    assert s["spread"] == round(0.3, 3)
    assert s["reps"] == 4


def test_rep_stats_single():
    s = bench_e2e._rep_stats([1.5])
    assert s["median"] == 1.5 and s["spread"] == 0.0


def test_channel_health_fields():
    # CPU run: the fields exist and are positive; the absolute values
    # only mean something on the tunnel
    h = bench_e2e.channel_health()
    assert set(h) == {"dispatch_floor_ms", "h2d_mb_per_s", "h2d_probe_mb"}
    # the CPU backend's trivial round-trip rounds to 0.0 ms; on the
    # tunnel these read ~25-40 ms / ~7-35 MB/s
    assert h["dispatch_floor_ms"] >= 0
    assert h["h2d_mb_per_s"] > 0


def test_sustained_scaling_math():
    """The est_sec_per_slide composition: per-crop median scaled to the
    large-tier geometry plus the detection estimate from the measured
    window rate."""
    n_crops, median = 96, 2.4
    det_rate = 20.0
    seg_est = median / n_crops * bench_e2e.LARGE_CROPS
    det_est = bench_e2e.LARGE_WINDOWS / det_rate
    ref = (bench_e2e.LARGE_CROPS * 5 * 0.295
           + bench_e2e.LARGE_WINDOWS / 0.095)
    e2e = det_est + seg_est
    assert round(ref / e2e, 1) > 1.0
    # the committed reference composition matches BASELINE.md round 4
    assert abs(ref - (506.0 + 168.4)) < 1.5


def test_sustained_compact_detections_are_deterministic():
    """Fixed seed -> identical crop sizes every round, so the flat-bucket
    programs compile once ever (the budget math relies on it)."""
    rng1 = np.random.RandomState(1234)
    rng2 = np.random.RandomState(1234)
    s1 = [int(rng1.uniform(300, 1000)) for _ in range(96)]
    s2 = [int(rng2.uniform(300, 1000)) for _ in range(96)]
    assert s1 == s2
    assert min(s1) >= 300 and max(s1) < 1000
