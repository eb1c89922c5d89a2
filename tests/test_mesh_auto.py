"""``--mesh auto``: the fold x data layout resolved with zero operator
knowledge (VERDICT r4 weak 5 — the measured policy lived in prose).

Policy unit tests + a CLI A/B on the 8-device CPU mesh certifying that the
auto-resolved mesh produces byte-identical artifacts to the same mesh
spelled out explicitly (the sharded == unsharded certification itself
lives in test_sharded_ensemble.py and __graft_entry__.dryrun_multichip).
"""
import glob

import pytest

from glomeruli_segmentation_tpu.parallel.mesh import (
    auto_data_parallel,
    resolve_auto_mesh,
)


def test_resolve_auto_mesh_policy():
    # 8 devices x 5 folds: fold axis filled first, one fold per device
    assert resolve_auto_mesh(5, 48, n_devices=8) == (8, 1)
    # 16 devices: fold 8 (pads 5 -> 8), leftover devices to data
    assert resolve_auto_mesh(5, 48, n_devices=16) == (8, 2)
    # 12 devices: smallest divisor >= 5 is 6
    assert resolve_auto_mesh(5, 48, n_devices=12) == (6, 2)
    # fewer devices than folds: all fold
    assert resolve_auto_mesh(5, 48, n_devices=4) == (4, 1)
    assert resolve_auto_mesh(5, 48, n_devices=2) == (2, 1)
    # single device: no mesh
    assert resolve_auto_mesh(5, 48, n_devices=1) == (0, 0)
    # indivisible batch pushes devices onto the fold axis instead
    assert resolve_auto_mesh(5, 7, n_devices=16) == (16, 1)
    # a single fold has no ensemble fixed cost: pure data parallelism
    assert resolve_auto_mesh(1, 32, n_devices=8) == (0, 8)
    assert resolve_auto_mesh(1, 6, n_devices=8) == (0, 6)


def test_auto_data_parallel_policy():
    assert auto_data_parallel(8, n_devices=8) == 8
    assert auto_data_parallel(6, n_devices=8) == 6
    assert auto_data_parallel(32, n_devices=8) == 8
    assert auto_data_parallel(5, n_devices=4) == 0  # nothing divides
    assert auto_data_parallel(8, n_devices=1) == 0


def _base_argv(target_list, data_dir, out_dir, models_dir):
    return [
        "--model", "unused-by-blob-backend",
        "--target_list", str(target_list),
        "--data_dir", str(data_dir),
        "--staining", "OPT_PAS",
        "--output_dir", str(out_dir),
        "--segmentation_weights_dir", str(models_dir),
        "--folds", "1", "2",
        "--window_size", "100", "--overlap_ratio", "0.5",
        "--conf_threshold", "0.5", "--merge_conf_threshold", "0.9",
        "--seg_batch_size", "2", "--precision", "highest",
    ]


def test_resolve_mesh_policy_mutations(tmp_path):
    """The CLI-level policy: auto fills the flags, explicit flags win,
    'off'/explicit-engine/segformer leave everything untouched."""
    from glomeruli_segmentation_tpu.cli.e2e import (
        build_parser,
        detector_data_parallel,
        resolve_mesh_policy,
    )

    argv = _base_argv("t", "d", "o", "m")

    # default (auto) on the 8-device test mesh: folds (1,2), batch 2 ->
    # fold axis grows to 4 so the data axis divides the batch
    args = build_parser().parse_args(argv)
    resolve_mesh_policy(args)
    assert (args.fold_parallel, args.data_parallel) == (4, 2)
    # the detector's window mesh is sized to ITS batch (default 8)
    assert detector_data_parallel(args) == 8

    # explicit flags win over auto
    args = build_parser().parse_args(argv + ["--fold_parallel", "2",
                                             "--data_parallel", "2"])
    resolve_mesh_policy(args)
    assert (args.fold_parallel, args.data_parallel) == (2, 2)

    # --mesh off: never auto-shard
    args = build_parser().parse_args(argv + ["--mesh", "off"])
    resolve_mesh_policy(args)
    assert (args.fold_parallel, args.data_parallel) == (0, 0)
    assert detector_data_parallel(args) == 0

    # an explicit engine pins the single-device path
    args = build_parser().parse_args(argv + ["--engine", "packed"])
    resolve_mesh_policy(args)
    assert (args.fold_parallel, args.data_parallel) == (0, 0)

    # SegFormer path keeps its explicit-flag contract
    args = build_parser().parse_args(
        argv + ["--segformer_checkpoint", "ckpt"])
    resolve_mesh_policy(args)
    assert (args.fold_parallel, args.data_parallel) == (0, 0)


@pytest.mark.slow
def test_e2e_cli_mesh_auto_matches_explicit(tmp_path, reference_models_dir,
                                            monkeypatch):
    """gseg-e2e with the default ``--mesh auto`` produces byte-identical
    artifacts to the same fold x data layout passed explicitly."""
    import glomeruli_segmentation_tpu.cli.detect as cli_detect
    from test_detect_stage import BlobBackend
    from test_e2e_fused import _make_slide

    from glomeruli_segmentation_tpu.cli.e2e import main as e2e_main

    slide_path, target_list, patient = _make_slide(tmp_path,
                                                   patient="H16-77779")
    monkeypatch.setattr(cli_detect, "load_backend",
                        lambda *a, **k: BlobBackend())

    out_auto = tmp_path / "out_auto"
    out_expl = tmp_path / "out_expl"
    base = lambda out: _base_argv(target_list, tmp_path / "data", out,
                                  reference_models_dir)
    e2e_main(base(out_auto))  # default --mesh auto -> fold 4 x data 2
    e2e_main(base(out_expl) + ["--fold_parallel", "4",
                               "--data_parallel", "2"])

    for name in ("OPT_PAS_GlomusMergedList_.csv", f"{patient}_pred.jpg"):
        a = (out_auto / name).read_bytes()
        b = (out_expl / name).read_bytes()
        assert a == b, f"{name} differs between auto and explicit mesh"
    ja = sorted(glob.glob(str(out_auto / "json" / patient / "*.json")))
    jb = sorted(glob.glob(str(out_expl / "json" / patient / "*.json")))
    assert len(ja) == len(jb) > 0
    for fa, fb in zip(ja, jb):
        assert open(fa, "rb").read() == open(fb, "rb").read()
