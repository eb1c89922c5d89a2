"""SegFormer GTCS flow tests: metric, dataset split, train->test chain."""
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from glomeruli_segmentation_tpu.data.segformer_dataset import (
    ResizedGlomerularDataset,
    feature_extract,
)
from glomeruli_segmentation_tpu.eval.mean_iou import mean_iou
from glomeruli_segmentation_tpu.utils.labelme_io import lblsave


def test_mean_iou_matches_simple_case():
    pred = np.asarray([[0, 1], [1, 2]])
    gt = np.asarray([[0, 1], [2, 2]])
    m = mean_iou([pred], [gt], num_labels=3, ignore_index=255)
    # class0: i=1 u=1; class1: i=1 u=2; class2: i=1 u=2
    np.testing.assert_allclose(m["per_category_iou"], [1.0, 0.5, 0.5])
    np.testing.assert_allclose(m["mean_iou"], 2 / 3)
    np.testing.assert_allclose(m["overall_accuracy"], 3 / 4)
    np.testing.assert_array_equal(m["total_area_pred_label"], [1, 2, 1])


def test_mean_iou_ignore_index():
    pred = np.asarray([[0, 1]])
    gt = np.asarray([[255, 1]])
    m = mean_iou([pred], [gt], num_labels=2, ignore_index=255)
    np.testing.assert_array_equal(m["total_area_label"], [0, 1])
    assert m["overall_accuracy"] == 1.0


def _gtcs_tree(tmp_path, n_specimens=5, crops_per=2, size=96):
    rng = np.random.RandomState(0)
    root = tmp_path / "01_Todai" / "20260101"
    for s in range(n_specimens):
        spec = f"H16-0000{s}"
        rgb = root / "rgb" / spec
        lbl = root / "label" / "gtcs" / spec
        rgb.mkdir(parents=True)
        lbl.mkdir(parents=True)
        for i in range(crops_per):
            img = np.full((size, size, 3), 225, np.uint8)
            mask = np.zeros((size, size), np.uint8)
            cy, cx = rng.randint(30, size - 30, 2)
            yy, xx = np.mgrid[:size, :size]
            blob = ((yy - cy) ** 2 + (xx - cx) ** 2) < 18 ** 2
            img[blob] = (120, 70, 110)
            mask[blob] = 1
            cv2.imwrite(str(rgb / f"xmin{i}_ymin0_xmax9_ymax9.PNG"),
                        img[:, :, ::-1])
            lblsave(str(lbl / f"xmin{i}_ymin0_xmax9_ymax9.PNG"), mask)
    return tmp_path


def test_dataset_fold_split(tmp_path):
    root = _gtcs_tree(tmp_path)
    data_source = str(tmp_path / "01_Todai" / "20260101")
    train = ResizedGlomerularDataset(data_source, mode="train", fold=1,
                                     input_size=64)
    val = ResizedGlomerularDataset(data_source, mode="val", fold=1,
                                   input_size=64)
    test = ResizedGlomerularDataset(data_source, mode="test", fold=1,
                                    input_size=64)
    assert len(train) + len(val) == len(test) == 10
    assert len(val) == 2  # one specimen of five
    item = train.get(0, np.random.default_rng(0))
    assert item["pixel_values"].shape == (64, 64, 3)
    assert item["labels"].shape == (64, 64)
    # ImageNet normalization applied
    assert abs(float(item["pixel_values"].mean())) < 5


def test_segformer_data_parallel_step_matches_single_device():
    """One sharded SegFormer train step over the 8-device mesh == the
    unsharded step on the identical (padded) batch; ragged batches pad
    images by repetition and labels with ignore_index 255 so the padded
    rows stay out of the loss (train/segformer_train.py::_pad_batch)."""
    from argparse import Namespace

    import jax
    import jax.numpy as jnp
    import optax

    from glomeruli_segmentation_tpu.models.segformer import (
        Segformer,
        SegformerConfig,
    )
    from glomeruli_segmentation_tpu.train.segformer_train import (
        _build_mesh,
        _pad_batch,
        _put,
        build_steps,
    )

    cfg = SegformerConfig(num_labels=3, hidden_sizes=(8, 16, 40, 64),
                          depths=(1, 1, 1, 1), sr_ratios=(8, 4, 2, 1),
                          patch_sizes=(7, 3, 3, 3), mlp_ratio=2,
                          decoder_hidden_size=32)
    model = Segformer(cfg)
    rng = np.random.RandomState(0)
    x = rng.rand(6, 64, 64, 3).astype(np.float32)
    y = rng.randint(0, 3, size=(6, 64, 64)).astype(np.int32)
    variables = model.init(jax.random.key(0), jnp.asarray(x[:1]), train=True)
    tx = optax.adamw(6e-5)

    # ragged 6-row batch pads to the 8-device multiple: images repeat,
    # labels get ignore_index (so only train-mode BN sees the padding)
    mesh8 = _build_mesh(Namespace(data_parallel=8))
    xs, ys, n_real = _pad_batch(x, y, mesh8)
    assert n_real == 6 and xs.shape[0] == 8
    assert (ys[6:] == 255).all() and (xs[6:] == xs[5]).all()

    out = {}
    for n_dev in (0, 8):
        mesh = _build_mesh(Namespace(data_parallel=n_dev))
        train_step, eval_step = build_steps(model, tx, mesh)
        params, stats, _, loss = train_step(
            variables["params"], variables["batch_stats"],
            tx.init(variables["params"]), _put(xs, mesh), _put(ys, mesh))
        logits = eval_step(params, stats, _put(xs, mesh))
        out[n_dev] = (float(loss), np.asarray(logits)[:n_real])
    # the identical padded batch through both paths: loss is a global
    # reduction (psum when sharded), equal up to reduction order.
    # Post-step logits pass through adamw, whose m/sqrt(v) normalization
    # amplifies reduction-order noise in near-zero gradients to the lr
    # scale (6e-5/param) — hence the looser bound (measured max 2e-4).
    np.testing.assert_allclose(out[0][0], out[8][0], rtol=1e-5)
    np.testing.assert_allclose(out[0][1], out[8][1], rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_segformer_train_data_parallel_e2e(tmp_path):
    """`gseg-segformer-train --data_parallel 8` runs the real loop over
    the CPU mesh: ragged batch-2 loads pad to the 8-device multiple,
    eval logits slice back to the real count, artifacts land."""
    from glomeruli_segmentation_tpu.cli.segformer_train import (
        build_parser as train_parser,
    )
    from glomeruli_segmentation_tpu.train.segformer_train import (
        train_segformer,
    )

    _gtcs_tree(tmp_path, n_specimens=5, crops_per=1, size=96)
    model_root = tmp_path / "models"
    args = train_parser().parse_args([
        "--site", "01_Todai", "--data_root", str(tmp_path),
        "--data_date", "20260101", "--model_root", str(model_root),
        "--output_dir", "exp_dp", "--fold", "1", "--max_epoch", "1",
        "--save_interval", "1", "--batch_size", "2", "--num_labels", "5",
        "--input_size", "96", "--data_parallel", "8",
    ])
    train_segformer(args)
    log = (model_root / "01_Todai" / "exp_dp" / "fold1"
           / "log.txt").read_text()
    assert "eval_mean_iou" in log


@pytest.mark.slow
def test_segformer_train_test_chain(tmp_path):
    from glomeruli_segmentation_tpu.cli.segformer_test import (
        build_parser as test_parser,
    )
    from glomeruli_segmentation_tpu.cli.segformer_train import (
        build_parser as train_parser,
    )
    from glomeruli_segmentation_tpu.pipeline.segformer_test import (
        run_segformer_test,
        search_best_checkpoint,
    )
    from glomeruli_segmentation_tpu.train.segformer_train import (
        train_segformer,
    )

    _gtcs_tree(tmp_path, n_specimens=5, crops_per=1, size=96)
    model_root = tmp_path / "models"
    args = train_parser().parse_args([
        "--site", "01_Todai", "--data_root", str(tmp_path),
        "--data_date", "20260101", "--model_root", str(model_root),
        "--output_dir", "exp", "--fold", "1", "--max_epoch", "2",
        "--save_interval", "1", "--batch_size", "2", "--num_labels", "5",
        "--input_size", "96",
    ])
    out_dir = train_segformer(args)
    log = (model_root / "01_Todai" / "exp" / "fold1" / "log.txt").read_text()
    assert "eval_mean_iou" in log
    best = search_best_checkpoint(out_dir)
    assert best.startswith("checkpoint-")

    report_root = tmp_path / "reports"
    targs = test_parser().parse_args([
        "--fold", "1", "--target_site", "01_Todai", "--model_site",
        "01_Todai", "--data_date", "20260101",
        "--model_base_path", str(model_root),
        "--pretrained_model", "exp", "--checkpoint", "",
        "--report_root_path", str(report_root),
        "--data_root", str(tmp_path), "--num_labels", "5",
        "--input_size", "96",
    ])
    run_segformer_test(targs)
    rep = (report_root / "01_Todai" / "01_Todai" / "20260101" / "exp"
           / "fold1")
    pixel_rows = (rep / "pred_summary_pixel.csv").read_text().splitlines()
    assert pixel_rows[0] == ("specimen_id,filename,background,glomerulus,"
                             "tuft,crescent,sclerosis,mIoU")
    assert len(pixel_rows) == 6  # header + 5 crops
    report = (rep / "summary_report.csv").read_text()
    assert "overall_mean_iou" in report


def test_backbone_only_import_maps_encoder():
    """The published nvidia/mit-b0 checkpoint is backbone-only (HF
    SegformerForImageClassification layout); the importer must map the
    encoder and leave the decode head to the trainer's init
    (SegFormer/train/train.py:140-141,211-212)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from glomeruli_segmentation_tpu.convert.segformer_import import (
        hf_state_dict_to_variables,
    )

    hf = transformers.SegformerForImageClassification(
        transformers.SegformerConfig(num_labels=2))
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    variables = hf_state_dict_to_variables(sd)
    assert "head" not in variables["params"]
    got = variables["params"]["encoder"]["patch_embed0"]["proj"]["kernel"]
    want = sd["segformer.encoder.patch_embeddings.0.proj.weight"
              ].transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_pretrained_mit_b0_training_flow(tmp_path, capsys):
    """gseg-segformer-train --pretrained_checkpoint <hf dir>: fine-tunes
    from a backbone-only mit-b0-layout checkpoint end-to-end."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from glomeruli_segmentation_tpu.cli.segformer_train import (
        build_parser as train_parser,
    )
    from glomeruli_segmentation_tpu.train.segformer_train import (
        train_segformer,
    )

    hf = transformers.SegformerForImageClassification(
        transformers.SegformerConfig(num_labels=2))
    ckpt_dir = tmp_path / "mit-b0"
    ckpt_dir.mkdir()
    torch.save(hf.state_dict(), str(ckpt_dir / "pytorch_model.bin"))

    _gtcs_tree(tmp_path, n_specimens=5, crops_per=1, size=96)
    model_root = tmp_path / "models"
    args = train_parser().parse_args([
        "--site", "01_Todai", "--data_root", str(tmp_path),
        "--data_date", "20260101", "--model_root", str(model_root),
        "--output_dir", "pre", "--fold", "1", "--max_epoch", "1",
        "--save_interval", "1", "--batch_size", "2", "--num_labels", "5",
        "--input_size", "96",
        "--pretrained_checkpoint", str(ckpt_dir),
    ])
    out_dir = train_segformer(args)
    stdout = capsys.readouterr().out
    # the whole MiT-B0 encoder (192 tensors) came from the checkpoint
    assert "pretrained checkpoint loaded" in stdout
    n = int(stdout.split("pretrained checkpoint loaded (")[1].split()[0])
    assert n == 192, stdout
    assert "log.txt" in os.listdir(out_dir)


def test_segformer_bf16_mixed_precision():
    """--bf16 SegFormer: bf16 compute, f32 masters/statistics.

    Same contract as the ESPNet trainer's --bf16: identical param tree,
    bf16 logits, f32 BN stats, and a training-step loss close to f32.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from glomeruli_segmentation_tpu.models.segformer import (
        Segformer,
        SegformerConfig,
    )
    from glomeruli_segmentation_tpu.train.segformer_train import build_steps

    cfg = SegformerConfig(num_labels=3, hidden_sizes=(8, 16, 40, 64),
                          depths=(1, 1, 1, 1), sr_ratios=(8, 4, 2, 1),
                          patch_sizes=(7, 3, 3, 3), mlp_ratio=2,
                          decoder_hidden_size=32)
    f32 = Segformer(cfg)
    bf16 = Segformer(cfg, dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    y = jnp.asarray(rng.randint(0, 3, (2, 64, 64)), jnp.int32)
    variables = f32.init(jax.random.key(0), x[:1], train=True)
    assert (jax.tree.structure(bf16.init(jax.random.key(0), x[:1],
                                         train=True))
            == jax.tree.structure(variables))

    logits, upd = bf16.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    assert logits.dtype == jnp.bfloat16
    assert all(s.dtype == jnp.float32
               for s in jax.tree.leaves(upd["batch_stats"]))

    tx = optax.adamw(6e-5)
    losses = {}
    for name, model in (("f32", f32), ("bf16", bf16)):
        train_step, _ = build_steps(model, tx)
        p, bs, _, loss = train_step(variables["params"],
                                    variables["batch_stats"],
                                    tx.init(variables["params"]), x, y)
        assert all(g.dtype == jnp.float32 for g in jax.tree.leaves(p))
        losses[name] = float(loss)
    np.testing.assert_allclose(losses["bf16"], losses["f32"], rtol=5e-2)

    # CLI flag exists and defaults off
    from glomeruli_segmentation_tpu.cli.segformer_train import build_parser
    base = ["--data_root", "/tmp", "--data_date", "d",
            "--model_root", "/tmp", "--site", "01_Todai"]
    assert build_parser().parse_args(base).bf16 is False
    assert build_parser().parse_args(base + ["--bf16"]).bf16 is True


def test_segformer_gradient_accumulation():
    """--accumulation_steps k (HF gradient_accumulation_steps,
    SegFormer/train/train.py:232): the optimizer applies once per k
    micro-batches with the averaged gradient; params are unchanged on
    non-boundary micro-steps."""
    import jax
    import jax.numpy as jnp
    import optax

    from glomeruli_segmentation_tpu.models.segformer import (
        Segformer,
        SegformerConfig,
    )
    from glomeruli_segmentation_tpu.train.segformer_train import build_steps

    cfg = SegformerConfig(num_labels=3, hidden_sizes=(8, 16, 40, 64),
                          depths=(1, 1, 1, 1), sr_ratios=(8, 4, 2, 1),
                          patch_sizes=(7, 3, 3, 3), mlp_ratio=2,
                          decoder_hidden_size=32)
    model = Segformer(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    y = jnp.asarray(rng.randint(0, 3, (2, 64, 64)), jnp.int32)
    variables = model.init(jax.random.key(0), x[:1], train=True)

    tx = optax.MultiSteps(optax.adamw(6e-5), every_k_schedule=2)
    train_step, _ = build_steps(model, tx)
    p0 = variables["params"]
    p1, bs, opt, loss1 = train_step(p0, variables["batch_stats"],
                                    tx.init(p0), x, y)
    # micro-step 1 of 2: gradient banked, parameters untouched
    flat0 = np.concatenate([np.ravel(v) for v in jax.tree.leaves(p0)])
    flat1 = np.concatenate([np.ravel(v) for v in jax.tree.leaves(p1)])
    np.testing.assert_array_equal(flat0, flat1)
    # micro-step 2: the averaged gradient applies
    p2, _, opt, loss2 = train_step(p1, bs, opt, x, y)
    flat2 = np.concatenate([np.ravel(v) for v in jax.tree.leaves(p2)])
    assert not np.array_equal(flat1, flat2)
    assert np.isfinite(loss1) and np.isfinite(loss2)

    # the CLI flag default matches the reference's (train.py:146-148)
    from glomeruli_segmentation_tpu.cli.segformer_train import build_parser
    base = ["--data_root", "/tmp", "--data_date", "d",
            "--model_root", "/tmp", "--site", "01_Todai"]
    assert build_parser().parse_args(base).accumulation_steps == 1


def test_segformer_test_data_parallel_matches_single_device(tmp_path):
    """gseg-segformer-test --data_parallel 8 must reproduce the
    single-device report byte-for-byte (crop batches sharded over the
    CPU mesh, params replicated — the same CLI policy as every other
    forward-running stage)."""
    from glomeruli_segmentation_tpu.cli.segformer_test import (
        build_parser as test_parser,
    )
    from glomeruli_segmentation_tpu.cli.segformer_train import (
        build_parser as train_parser,
    )
    from glomeruli_segmentation_tpu.pipeline.segformer_test import (
        run_segformer_test,
    )
    from glomeruli_segmentation_tpu.train.segformer_train import (
        train_segformer,
    )

    _gtcs_tree(tmp_path, n_specimens=5, crops_per=1, size=96)
    model_root = tmp_path / "models"
    train_segformer(train_parser().parse_args([
        "--site", "01_Todai", "--data_root", str(tmp_path),
        "--data_date", "20260101", "--model_root", str(model_root),
        "--output_dir", "exp", "--fold", "1", "--max_epoch", "1",
        "--save_interval", "1", "--batch_size", "2", "--num_labels", "5",
        "--input_size", "96",
    ]))

    reports = {}
    for dp in (0, 8):
        report_root = tmp_path / f"reports_dp{dp}"
        run_segformer_test(test_parser().parse_args([
            "--fold", "1", "--target_site", "01_Todai", "--model_site",
            "01_Todai", "--data_date", "20260101",
            "--model_base_path", str(model_root),
            "--pretrained_model", "exp", "--checkpoint", "",
            "--report_root_path", str(report_root),
            "--data_root", str(tmp_path), "--num_labels", "5",
            "--input_size", "96", "--batch_size", "8",
            "--data_parallel", str(dp),
        ]))
        rep = (report_root / "01_Todai" / "01_Todai" / "20260101" / "exp"
               / "fold1")
        reports[dp] = ((rep / "pred_summary_pixel.csv").read_text(),
                       (rep / "summary_report.csv").read_text())
    assert reports[0] == reports[8]
