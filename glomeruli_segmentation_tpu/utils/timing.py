"""Structured per-stage timing and profiling hooks.

The reference logs per-slide wall time to ``*_log.csv`` files
(``detect_glomus_test.py:110-112,152-158``,
``merge_overlaped_glomus.py:103-132``); this module keeps that CSV contract
(:class:`StageTimer` writes the same rows) and adds structured JSONL
metrics plus optional ``jax.profiler`` traces for TPU work.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


class StageTimer:
    """Per-item wall-clock logging: reference CSV + structured JSONL."""

    def __init__(self, csv_path: Optional[str] = None,
                 jsonl_path: Optional[str] = None, stage: str = ""):
        self.stage = stage
        self._csv = open(csv_path, "w") if csv_path else None
        if self._csv:
            self._csv.write("file,time\n")
        self._jsonl = open(jsonl_path, "a") if jsonl_path else None

    @contextlib.contextmanager
    def item(self, name: str, **extra):
        start = time.time()
        try:
            yield
        finally:
            duration = time.time() - start
            if self._csv:
                self._csv.write('"{}",{}\n'.format(name, duration))
                self._csv.flush()
            if self._jsonl:
                self._jsonl.write(json.dumps({
                    "stage": self.stage, "item": name,
                    "seconds": duration, "ts": time.time(), **extra}) + "\n")
                self._jsonl.flush()

    def close(self):
        for f in (self._csv, self._jsonl):
            if f:
                f.close()
        self._csv = self._jsonl = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """Wrap a block in a jax.profiler trace when ``log_dir`` is set."""
    if not log_dir:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
