"""Frozen OD-API graph -> native inception_v2 Faster R-CNN import tests.

A tiny-width graph with the real export's variable layout
(FirstStageFeatureExtractor/InceptionV2/..., Conv/*, FirstStageBoxPredictor,
SecondStage*) is synthesized, imported through convert/pb_import.py, and
the assembled forward is checked numerically against an independent numpy
implementation of the TF semantics (SAME padding, depthwise-separable stem,
padding-excluding avg pool, unfolded batch norm) — a layout or BN-folding
bug in the importer or the JAX trunk would diverge immediately.
"""
import numpy as np
import pytest

from pb_graph_writer import write_graph

from glomeruli_segmentation_tpu.convert.pb_import import (
    UnmappedWeightsError,
    assemble_od_api_params,
    load_od_api_detector_params,
)

FIRST = "FirstStageFeatureExtractor/InceptionV2/"
SECOND = "SecondStageFeatureExtractor/InceptionV2/"

# tiny-width inception_v2 (real widths / ~16): per block, branch widths
STANDARD_BLOCKS = {
    "Mixed_3b": ((4,), (4, 4), (4, 6, 6), (2,)),
    "Mixed_3c": ((4,), (4, 6), (4, 6, 6), (4,)),
    "Mixed_4b": ((14,), (4, 6), (6, 8, 8), (8,)),
    "Mixed_4c": ((12,), (6, 8), (6, 8, 8), (8,)),
    "Mixed_4d": ((10,), (8, 10), (8, 10, 10), (6,)),
    "Mixed_4e": ((6,), (8, 12), (10, 12, 12), (6,)),
    "Mixed_5b": ((22,), (12, 20), (10, 14, 14), (8,)),
    "Mixed_5c": ((22,), (12, 20), (12, 14, 14), (8,)),
}
DOWNSAMPLE_BLOCKS = {
    "Mixed_4a": ((8, 10), (4, 6, 6)),
    "Mixed_5a": ((8, 12), (12, 16, 16)),
}
FIRST_ORDER = ("Mixed_3b", "Mixed_3c", "Mixed_4a", "Mixed_4b", "Mixed_4c",
               "Mixed_4d", "Mixed_4e")
SECOND_ORDER = ("Mixed_5a", "Mixed_5b", "Mixed_5c")
RPN_DEPTH = 16
NUM_ANCHORS = 12


def _add_conv(consts, rng, scope, k, cin, cout, gamma=False, bias=False):
    consts[scope + "/weights"] = rng.normal(
        0, 0.4 / np.sqrt(k * k * cin), (k, k, cin, cout)).astype(np.float32)
    if bias:
        consts[scope + "/biases"] = rng.normal(
            0, 0.1, (cout,)).astype(np.float32)
    else:
        consts[scope + "/BatchNorm/beta"] = rng.normal(
            0, 0.2, (cout,)).astype(np.float32)
        consts[scope + "/BatchNorm/moving_mean"] = rng.normal(
            0, 0.2, (cout,)).astype(np.float32)
        consts[scope + "/BatchNorm/moving_variance"] = rng.uniform(
            0.5, 1.5, (cout,)).astype(np.float32)
        if gamma:
            consts[scope + "/BatchNorm/gamma"] = rng.uniform(
                0.8, 1.2, (cout,)).astype(np.float32)
    return cout


def _add_block(consts, rng, prefix, name, cin):
    """Returns the block's output width."""
    out = 0
    if name in DOWNSAMPLE_BLOCKS:
        (b0a, b0b), (b1a, b1b, b1c) = DOWNSAMPLE_BLOCKS[name]
        p = f"{prefix}{name}/"
        _add_conv(consts, rng, p + "Branch_0/Conv2d_0a_1x1", 1, cin, b0a)
        _add_conv(consts, rng, p + "Branch_0/Conv2d_1a_3x3", 3, b0a, b0b)
        _add_conv(consts, rng, p + "Branch_1/Conv2d_0a_1x1", 1, cin, b1a)
        _add_conv(consts, rng, p + "Branch_1/Conv2d_0b_3x3", 3, b1a, b1b)
        _add_conv(consts, rng, p + "Branch_1/Conv2d_1a_3x3", 3, b1b, b1c)
        return b0b + b1c + cin  # + max-pooled passthrough
    (b0,), (b1a, b1b), (b2a, b2b, b2c), (b3,) = STANDARD_BLOCKS[name]
    p = f"{prefix}{name}/"
    gamma = name == "Mixed_3b"  # exercise the optional-gamma fold path
    _add_conv(consts, rng, p + "Branch_0/Conv2d_0a_1x1", 1, cin, b0, gamma)
    _add_conv(consts, rng, p + "Branch_1/Conv2d_0a_1x1", 1, cin, b1a, gamma)
    _add_conv(consts, rng, p + "Branch_1/Conv2d_0b_3x3", 3, b1a, b1b, gamma)
    _add_conv(consts, rng, p + "Branch_2/Conv2d_0a_1x1", 1, cin, b2a)
    _add_conv(consts, rng, p + "Branch_2/Conv2d_0b_3x3", 3, b2a, b2b)
    _add_conv(consts, rng, p + "Branch_2/Conv2d_0c_3x3", 3, b2b, b2c)
    _add_conv(consts, rng, p + "Branch_3/Conv2d_0b_1x1", 1, cin, b3)
    return b0 + b1b + b2c + b3


def build_od_api_consts(seed=0, num_classes=1):
    rng = np.random.RandomState(seed)
    consts = {}
    # stem: separable 7x7 (depth multiplier 2 -> pointwise 4)
    consts[FIRST + "Conv2d_1a_7x7/depthwise_weights"] = rng.normal(
        0, 0.1, (7, 7, 3, 2)).astype(np.float32)
    consts[FIRST + "Conv2d_1a_7x7/pointwise_weights"] = rng.normal(
        0, 0.2, (1, 1, 6, 4)).astype(np.float32)
    for suffix, spread in (("beta", 0.2), ("moving_mean", 0.2)):
        consts[FIRST + f"Conv2d_1a_7x7/BatchNorm/{suffix}"] = rng.normal(
            0, spread, (4,)).astype(np.float32)
    consts[FIRST + "Conv2d_1a_7x7/BatchNorm/moving_variance"] = rng.uniform(
        0.5, 1.5, (4,)).astype(np.float32)
    c = 4
    c = _add_conv(consts, rng, FIRST + "Conv2d_2b_1x1", 1, c, 4)
    c = _add_conv(consts, rng, FIRST + "Conv2d_2c_3x3", 3, c, 12)
    for name in FIRST_ORDER:
        c = _add_block(consts, rng, FIRST, name, c)
    first_out = c
    _add_conv(consts, rng, "Conv", 3, first_out, RPN_DEPTH, bias=True)
    _add_conv(consts, rng, "FirstStageBoxPredictor/BoxEncodingPredictor",
              1, RPN_DEPTH, NUM_ANCHORS * 4, bias=True)
    _add_conv(consts, rng, "FirstStageBoxPredictor/ClassPredictor",
              1, RPN_DEPTH, NUM_ANCHORS * 2, bias=True)
    for name in SECOND_ORDER:
        c = _add_block(consts, rng, SECOND, name, c)
    second_out = c
    consts["SecondStageBoxPredictor/BoxEncodingPredictor/weights"] = (
        rng.normal(0, 0.05, (second_out, 4 * num_classes)).astype(np.float32))
    consts["SecondStageBoxPredictor/BoxEncodingPredictor/biases"] = (
        rng.normal(0, 0.05, (4 * num_classes,)).astype(np.float32))
    consts["SecondStageBoxPredictor/ClassPredictor/weights"] = rng.normal(
        0, 0.05, (second_out, num_classes + 1)).astype(np.float32)
    consts["SecondStageBoxPredictor/ClassPredictor/biases"] = rng.normal(
        0, 0.05, (num_classes + 1,)).astype(np.float32)
    # non-weight consts a real graph carries (must be ignored)
    consts["GridAnchorGenerator/Const"] = np.asarray(
        [0.25, 0.5, 1.0, 2.0], np.float32)
    consts["global_step"] = np.asarray(123, np.int64)
    return consts, first_out, second_out


# ---------------------------------------------------------------------------
# numpy reference implementation of the TF semantics (independent of JAX)
# ---------------------------------------------------------------------------

def _same_pads(n, k, s):
    out = -(-n // s)
    total = max((out - 1) * s + k - n, 0)
    return total // 2, total - total // 2


def _windows(x, k, s, pad_value):
    ph = _same_pads(x.shape[0], k, s)
    pw = _same_pads(x.shape[1], k, s)
    xp = np.pad(x, (ph, pw, (0, 0)), constant_values=pad_value)
    sw = np.lib.stride_tricks.sliding_window_view(xp, (k, k), axis=(0, 1))
    return sw[::s, ::s]  # (H', W', C, k, k)


def np_conv_same(x, w, stride=1):
    sw = _windows(x.astype(np.float64), w.shape[0], stride, 0.0)
    return np.einsum("hwcij,ijco->hwo", sw, w.astype(np.float64))


def np_depthwise_same(x, w, stride=1):
    sw = _windows(x.astype(np.float64), w.shape[0], stride, 0.0)
    out = np.einsum("hwcij,ijcm->hwcm", sw, w.astype(np.float64))
    h, wd = out.shape[:2]
    return out.reshape(h, wd, -1)  # channel-major ic*M + m, like TF


def np_maxpool_same(x, k=3, stride=1):
    return _windows(x, k, stride, -np.inf).max(axis=(-1, -2))


def np_avgpool_same(x, k=3, stride=1):
    s = _windows(x.astype(np.float64), k, stride, 0.0).sum(axis=(-1, -2))
    cnt = _windows(np.ones(x.shape[:2] + (1,)), k, stride, 0.0
                   ).sum(axis=(-1, -2))
    return s / cnt


def np_bn(consts, scope, x, eps=0.001):
    mean = consts[scope + "/BatchNorm/moving_mean"]
    var = consts[scope + "/BatchNorm/moving_variance"]
    beta = consts[scope + "/BatchNorm/beta"]
    gamma = consts.get(scope + "/BatchNorm/gamma", 1.0)
    return (x - mean) / np.sqrt(var + eps) * gamma + beta


def np_slim_conv(consts, scope, x, stride=1, relu=True):
    y = np_conv_same(x, consts[scope + "/weights"], stride)
    if scope + "/biases" in consts:
        y = y + consts[scope + "/biases"]
    else:
        y = np_bn(consts, scope, y)
    return np.maximum(y, 0.0) if relu else y


def np_block(consts, prefix, name, x):
    p = f"{prefix}{name}/"
    if name in DOWNSAMPLE_BLOCKS:
        b0 = np_slim_conv(consts, p + "Branch_0/Conv2d_0a_1x1", x)
        b0 = np_slim_conv(consts, p + "Branch_0/Conv2d_1a_3x3", b0, stride=2)
        b1 = np_slim_conv(consts, p + "Branch_1/Conv2d_0a_1x1", x)
        b1 = np_slim_conv(consts, p + "Branch_1/Conv2d_0b_3x3", b1)
        b1 = np_slim_conv(consts, p + "Branch_1/Conv2d_1a_3x3", b1, stride=2)
        b2 = np_maxpool_same(x, 3, 2)
        return np.concatenate([b0, b1, b2], axis=-1)
    b0 = np_slim_conv(consts, p + "Branch_0/Conv2d_0a_1x1", x)
    b1 = np_slim_conv(consts, p + "Branch_1/Conv2d_0a_1x1", x)
    b1 = np_slim_conv(consts, p + "Branch_1/Conv2d_0b_3x3", b1)
    b2 = np_slim_conv(consts, p + "Branch_2/Conv2d_0a_1x1", x)
    b2 = np_slim_conv(consts, p + "Branch_2/Conv2d_0b_3x3", b2)
    b2 = np_slim_conv(consts, p + "Branch_2/Conv2d_0c_3x3", b2)
    pool = (np_maxpool_same(x, 3, 1) if name == "Mixed_5c"
            else np_avgpool_same(x, 3, 1))
    b3 = np_slim_conv(consts, p + "Branch_3/Conv2d_0b_1x1", pool)
    return np.concatenate([b0, b1, b2, b3], axis=-1)


def np_first_stage(consts, image):
    """image: (H, W, 3) preprocessed float."""
    y = np_depthwise_same(image,
                          consts[FIRST + "Conv2d_1a_7x7/depthwise_weights"],
                          stride=2)
    y = np_conv_same(y, consts[FIRST + "Conv2d_1a_7x7/pointwise_weights"])
    y = np.maximum(np_bn(consts, FIRST + "Conv2d_1a_7x7", y), 0.0)
    y = np_maxpool_same(y, 3, 2)
    y = np_slim_conv(consts, FIRST + "Conv2d_2b_1x1", y)
    y = np_slim_conv(consts, FIRST + "Conv2d_2c_3x3", y)
    y = np_maxpool_same(y, 3, 2)
    for name in FIRST_ORDER:
        y = np_block(consts, FIRST, name, y)
    return y


def np_second_stage(consts, feats):
    y = feats
    for name in SECOND_ORDER:
        y = np_block(consts, SECOND, name, y)
    return y


# ---------------------------------------------------------------------------


def test_first_stage_matches_numpy_emulator():
    from glomeruli_segmentation_tpu.models.inception_v2 import (
        proposal_features,
    )

    consts, first_out, _ = build_od_api_consts(seed=3)
    params, num_classes = assemble_od_api_params(consts)
    assert num_classes == 1

    rng = np.random.RandomState(1)
    img = rng.uniform(-1, 1, (1, 66, 97, 3)).astype(np.float32)
    got = np.asarray(proposal_features(params["first"], img))[0]
    want = np_first_stage(consts, img[0])
    assert got.shape == want.shape == (
        -(-66 // 16), -(-97 // 16), first_out)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_second_stage_matches_numpy_emulator():
    from glomeruli_segmentation_tpu.models.inception_v2 import (
        classifier_features,
    )

    consts, first_out, second_out = build_od_api_consts(seed=4)
    params, _ = assemble_od_api_params(consts)

    rng = np.random.RandomState(2)
    roi = rng.uniform(-1, 1, (3, 7, 7, first_out)).astype(np.float32)
    got = np.asarray(classifier_features(params["second"], roi))
    want = np.stack([np_second_stage(consts, r) for r in roi])
    assert got.shape == want.shape == (3, 4, 4, second_out)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # fc heads against the emulator too (mean pool + matmul)
    pooled = want.mean(axis=(1, 2))
    want_cls = pooled @ consts[
        "SecondStageBoxPredictor/ClassPredictor/weights"] + consts[
        "SecondStageBoxPredictor/ClassPredictor/biases"]
    got_cls = got.mean(axis=(1, 2)) @ np.asarray(
        params["fc_cls"]["w"]) + np.asarray(params["fc_cls"]["b"])
    np.testing.assert_allclose(got_cls, want_cls, rtol=2e-4, atol=2e-4)


def test_detect_contract_from_pb(tmp_path):
    """pb on disk -> backend -> frozen-graph output contract."""
    from glomeruli_segmentation_tpu.pipeline.detect import (
        ODAPIDetectorBackend,
    )

    consts, _, _ = build_od_api_consts(seed=5)
    pb = tmp_path / "frozen_inference_graph.pb"
    write_graph(consts, str(pb))

    backend = ODAPIDetectorBackend(
        str(pb), batch_size=2, compute_dtype="float32",
        min_dimension=64, max_dimension=96, pre_nms_top_n=200,
        max_proposals=20, max_detections=10)
    rng = np.random.RandomState(0)
    images = rng.randint(0, 255, (2, 128, 128, 3), np.uint8)
    boxes, scores, classes, num = backend.detect_batch(images)
    assert boxes.shape == (2, 10, 4)
    assert scores.shape == (2, 10) and classes.shape == (2, 10)
    assert np.all(boxes >= 0.0) and np.all(boxes <= 1.0)
    assert np.all(np.diff(scores, axis=1) <= 1e-6)  # sorted descending
    assert np.all(num <= 10) and np.all(num >= 0)
    assert np.all(classes == 1.0)
    # deterministic across calls (same jitted program)
    boxes2, scores2, _, _ = backend.detect_batch(images)
    np.testing.assert_array_equal(boxes, boxes2)
    np.testing.assert_array_equal(scores, scores2)


def test_unmapped_weights_error(tmp_path):
    consts, _, _ = build_od_api_consts(seed=6)
    consts["MysteryHead/weights"] = np.zeros((1, 1, 4, 4), np.float32)
    with pytest.raises(UnmappedWeightsError, match="MysteryHead"):
        assemble_od_api_params(consts)
    # and a non-OD-API graph (missing trunks) errors cleanly
    with pytest.raises(UnmappedWeightsError):
        assemble_od_api_params(
            {"scope/weights": np.zeros((1, 1, 3, 4), np.float32)})


def test_keep_aspect_resize_shape():
    from glomeruli_segmentation_tpu.models.od_api_frcnn import (
        keep_aspect_resize_shape,
    )

    assert keep_aspect_resize_shape(874, 874, 600, 1024) == (600, 600)
    assert keep_aspect_resize_shape(1200, 600, 600, 1024) == (1024, 512)
    assert keep_aspect_resize_shape(300, 400, 600, 1024) == (600, 800)
    assert keep_aspect_resize_shape(300, 600, 600, 1024) == (512, 1024)


@pytest.mark.slow
def test_detect_cli_loads_pb_end_to_end(tmp_path):
    """gseg-detect on a synthetic slide with a synthesized .pb: the full
    path the reference runs (example/README.md:27-38) — no hard error,
    CSV + timing log written."""
    from glomeruli_segmentation_tpu.cli.detect import main as detect_main
    from glomeruli_segmentation_tpu.wsi.synthetic import (
        pas_like_image,
        write_pyramidal_tiff,
    )

    consts, _, _ = build_od_api_consts(seed=7)
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    write_graph(consts, str(model_dir / "frozen_inference_graph.pb"))

    patient = "H16-22222"
    img, _ = pas_like_image(768, 1024, seed=3, n_glomeruli=2)
    slide_dir = tmp_path / "data" / "02_PAS" / patient
    slide_dir.mkdir(parents=True)
    write_pyramidal_tiff(str(slide_dir / f"{patient}.tiff"), img, mpp=0.25,
                         objective_power=40.0, levels=3)
    target_list = tmp_path / "targets.txt"
    target_list.write_text(f"{patient}/{patient}.tiff\n")

    detect_main([
        "--model", str(model_dir),
        "--target_list", str(target_list),
        "--data_dir", str(tmp_path / "data"),
        "--staining", "OPT_PAS",
        "--output_dir", str(tmp_path / "out"),
        "--window_size", "200", "--overlap_ratio", "0.1",
        "--conf_threshold", "0.0",
        "--batch_size", "2",
        "--min_dimension", "64", "--max_dimension", "96",
        "--max_proposals", "20",
    ])
    assert (tmp_path / "out" / "OPT_PAS_GlomusList_log.csv").exists()
    assert (tmp_path / "out" / "OPT_PAS_GlomusList.csv").exists()


def test_explicit_model_name_beats_checkpoint_discovery(tmp_path):
    """A fine-tuned ``od_api_detector.ckpt.pth`` written next to the
    downloaded ``.pb`` wins auto-discovery, but an explicit
    ``--model_name frozen_inference_graph.pb`` must load exactly the
    graph the user named."""
    import dataclasses

    import jax

    from glomeruli_segmentation_tpu.cli.detect import load_backend
    from glomeruli_segmentation_tpu.convert.pb_import import (
        assemble_od_api_params,
    )
    from glomeruli_segmentation_tpu.convert.torch_pickle import (
        save_torch_legacy,
    )
    from glomeruli_segmentation_tpu.models.od_api_frcnn import ODAPIConfig
    from glomeruli_segmentation_tpu.train.od_api_finetune import (
        OD_API_CKPT_NAME,
    )

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    pb_consts, _, _ = build_od_api_consts(seed=8, num_classes=1)
    write_graph(pb_consts, str(model_dir / "frozen_inference_graph.pb"))
    # the "fine-tuned" checkpoint uses 2 classes so the loaded backend
    # betrays which source it came from
    ck_consts, _, _ = build_od_api_consts(seed=9, num_classes=2)
    ck_params, ck_classes = assemble_od_api_params(ck_consts)
    save_torch_legacy({
        "od_api_params": jax.tree.map(np.asarray, ck_params),
        "num_classes": ck_classes,
        "od_config": dataclasses.asdict(ODAPIConfig(num_classes=ck_classes)),
    }, str(model_dir / OD_API_CKPT_NAME))

    auto = load_backend(str(model_dir), None, 2)
    assert auto.num_classes == 2  # checkpoint preferred when unnamed

    explicit = load_backend(str(model_dir), "frozen_inference_graph.pb", 2)
    assert explicit.num_classes == 1  # the named graph, not the checkpoint

    with pytest.raises(SystemExit, match="not found"):
        load_backend(str(model_dir), "missing.pb", 2)

    # an explicit name with a subdirectory component loads THAT file,
    # not a same-basename sibling at the top of model_dir
    runs = model_dir / "runs"
    runs.mkdir()
    sub_consts, _, _ = build_od_api_consts(seed=10, num_classes=3)
    sub_params, sub_classes = assemble_od_api_params(sub_consts)
    save_torch_legacy({
        "od_api_params": jax.tree.map(np.asarray, sub_params),
        "num_classes": sub_classes,
        "od_config": dataclasses.asdict(
            ODAPIConfig(num_classes=sub_classes)),
    }, str(runs / OD_API_CKPT_NAME))
    nested = load_backend(str(model_dir), f"runs/{OD_API_CKPT_NAME}", 2)
    assert nested.num_classes == 3  # the nested checkpoint, not top-level
