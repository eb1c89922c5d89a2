"""Multi-process (multi-host / DCN) data-parallel training parity.

The reference trains on exactly one GPU (``module/espnet/train/main.py:470``);
the TPU-native design extends the single-host ``--data_parallel`` mesh across
processes via ``jax.distributed`` (parallel/distributed.py).  This test runs
the same worker (``tests/distributed_worker.py``) twice over the SAME
4-device global mesh:

- once as a single process holding all 4 virtual CPU devices,
- once as two coordinated processes holding 2 devices each (the CPU
  backend's gloo collectives standing in for DCN),

and asserts the runs are equivalent: same final weights, same training
log.  Process 1 writes no artifacts (primary-only writes), and the
dataset-stats cache is produced once by process 0 behind the barrier.
"""
import glob
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from test_espnet_training import _make_dataset

from glomeruli_segmentation_tpu.convert.torch_pickle import load_torch_pickle

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(n_devices: int) -> dict:
    env = dict(os.environ)
    env["GSEG_PLATFORM"] = "cpu"
    env["GSEG_CPU_DEVICES"] = str(n_devices)
    # the worker subprocess must import the package even when the suite
    # runs from a tree that was never pip-installed (conftest only fixes
    # sys.path for the in-process suite); APPEND to PYTHONPATH — the axon
    # sitecustomize lives there and must stay first
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = (env["PYTHONPATH"] + os.pathsep + root
                         if env.get("PYTHONPATH") else root)
    # conftest forces an 8-device host platform for the in-process suite;
    # the workers size their device count via GSEG_CPU_DEVICES instead
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(flags)
    return env


def _worker_cmd(data_dir, savedir, cache=None, rank=None, port=None,
                trainer="espnet"):
    cmd = [sys.executable, WORKER, "--trainer", trainer,
           "--data_dir", str(data_dir), "--savedir", str(savedir)]
    if cache is not None:
        cmd += ["--cached_data_file", str(cache)]
    if rank is not None:
        cmd += ["--coordinator", f"127.0.0.1:{port}",
                "--num_processes", "2", "--process_id", str(rank)]
    return cmd


def _load_final_model(savedir):
    paths = sorted(glob.glob(str(savedir) + "*/model_*.pth"))
    assert paths, f"no model checkpoint under {savedir}*"
    return paths[-1], load_torch_pickle(paths[-1])


def _read_log(savedir):
    paths = glob.glob(str(savedir) + "*/trainValLog.txt")
    assert len(paths) == 1, paths
    return open(paths[0]).read()


def test_add_hist_matches_add_batch():
    """The in-jit confusion path (confusion_matrix + add_hist) must be
    semantically identical to the host path (add_batch on real rows),
    including padded-row dropping via sample_valid."""
    from glomeruli_segmentation_tpu.eval.iou_eval import (
        IouEval,
        confusion_matrix,
    )

    rng = np.random.RandomState(7)
    n_classes = 5
    pred = rng.randint(0, n_classes, (4, 8, 16)).astype(np.uint8)
    gt = rng.randint(0, n_classes, (4, 8, 16)).astype(np.uint8)
    n_real = 3  # last row is padding

    host = IouEval(n_classes)
    host.add_batch(pred[:n_real], gt[:n_real])

    dev = IouEval(n_classes)
    valid = np.arange(4) < n_real
    hist = confusion_matrix(pred, gt, n_classes, sample_valid=valid)
    dev.add_hist(hist)

    np.testing.assert_array_equal(host.hist, dev.hist)
    for a, b in zip(host.get_metric(), dev.get_metric()):
        np.testing.assert_allclose(a, b)


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    _make_dataset(tmp_path, size=(64, 128))
    data_dir = tmp_path

    # --- single process, 4 local devices ---
    single = subprocess.run(
        _worker_cmd(data_dir, tmp_path / "single", tmp_path / "c1.p"),
        env=_env(4), capture_output=True, text=True, timeout=1200)
    assert single.returncode == 0, single.stdout + single.stderr
    assert "WORKER-DONE process 0 of 1 devices 4" in single.stdout

    # --- two processes, 2 local devices each, same global mesh ---
    port = _free_port()
    shared_save = tmp_path / "multi"
    shared_cache = tmp_path / "c2.p"  # written by process 0, barrier-ordered
    procs = [subprocess.Popen(
        _worker_cmd(data_dir, shared_save, shared_cache, rank=r, port=port),
        env=_env(2), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for r in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=1200)
        outs.append((p.returncode, out, err))
    assert all(rc == 0 for rc, _, _ in outs), outs
    for r, (_, out, _) in enumerate(outs):
        assert f"WORKER-DONE process {r} of 2 devices 4" in out, out

    assert shared_cache.is_file()  # process-0 stats cache, read by rank 1

    # --- same weights ---
    _, ref = _load_final_model(tmp_path / "single")
    path_multi, got = _load_final_model(shared_save)
    assert set(ref) == set(got)
    for k in ref:
        a, b = np.asarray(ref[k]), np.asarray(got[k])
        assert a.shape == b.shape
        # batches are bit-identical by construction, but the gradient
        # all-reduce order differs between the in-process 4-device psum
        # and gloo's cross-process algorithm: observed max |delta| is
        # ~2.5e-6 after an epoch (pure reduction-order float noise).
        # A recipe/sharding bug shows up orders of magnitude above this.
        np.testing.assert_allclose(
            a, b, rtol=2e-4, atol=2e-5,
            err_msg=f"{k} diverged between single- and two-process runs")

    # --- same training log (losses/metrics), written by process 0 only ---
    log_single = _read_log(tmp_path / "single")
    log_multi = _read_log(shared_save)
    assert log_single.splitlines()[0] == log_multi.splitlines()[0]
    # numeric fields agree to the logged precision
    assert log_single == log_multi


@pytest.mark.slow
def test_two_process_segformer_matches_single_process(tmp_path):
    """Same harness for the SegFormer (GTCS) trainer: two coordinated
    processes over the global 4-device mesh reproduce the single-process
    run (weights to all-reduce noise, metrics to logged precision)."""
    import json

    from test_segformer_pipeline import _gtcs_tree

    _gtcs_tree(tmp_path, n_specimens=5, crops_per=1, size=96)

    single = subprocess.run(
        _worker_cmd(tmp_path, tmp_path / "m_single", trainer="segformer"),
        env=_env(4), capture_output=True, text=True, timeout=1200)
    assert single.returncode == 0, single.stdout + single.stderr

    port = _free_port()
    shared_save = tmp_path / "m_multi"
    procs = [subprocess.Popen(
        _worker_cmd(tmp_path, shared_save, rank=r, port=port,
                    trainer="segformer"),
        env=_env(2), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for r in range(2)]
    outs = [(p.communicate(timeout=1200), p.returncode) for p in procs]
    assert all(rc == 0 for _, rc in outs), outs
    for r, ((out, _), _) in enumerate(outs):
        assert f"WORKER-DONE process {r} of 2 devices 4" in out, out

    def load(root):
        ckpts = sorted(glob.glob(
            str(root / "01_Todai" / "exp" / "fold1" / "checkpoint-*"
                / "flax_model.pth")))
        assert ckpts, root
        return load_torch_pickle(ckpts[-1])

    ref, got = load(tmp_path / "m_single"), load(shared_save)
    ref_p, got_p = ref["params"], got["params"]

    def flatten(tree, prefix=""):
        if not isinstance(tree, dict):
            return {prefix: tree}
        out = {}
        for k, v in tree.items():
            out.update(flatten(v, f"{prefix}/{k}"))
        return out

    fr, fg = flatten(ref_p), flatten(got_p)
    assert set(fr) == set(fg)
    for k in fr:
        np.testing.assert_allclose(
            np.asarray(fr[k]), np.asarray(fg[k]), rtol=2e-4, atol=2e-5,
            err_msg=f"{k} diverged between single- and two-process runs")

    def log_entries(root):
        txt = (root / "01_Todai" / "exp" / "fold1" / "log.txt").read_text()
        return [json.loads(line) for line in txt.splitlines() if line]

    es, em = log_entries(tmp_path / "m_single"), log_entries(shared_save)
    assert len(es) == len(em)
    for a, b in zip(es, em):
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-3, atol=1e-5)
