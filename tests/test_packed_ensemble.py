"""Fold-packed ensemble (block-diagonal conv) parity tests.

The packed forward must compute exactly the per-fold networks: block-
diagonal kernels add only zero terms to every dot product, so up to
accumulation order the logits match the fold-scan engines and the argmax
matches exactly at f32/highest precision.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glomeruli_segmentation_tpu.models.espnet_packed import (
    PackedEnsembleESPNet,
    _block_diag,
    _concat_groups,
)
from glomeruli_segmentation_tpu.pipeline.fused import (
    FOLD_NORMALIZATION,
    EnsembleConfig,
    EnsembleSegmenter,
)


def test_block_diag_conv_equals_per_fold_convs():
    rng = np.random.RandomState(0)
    k1 = rng.randn(3, 3, 4, 6).astype(np.float32)
    k2 = rng.randn(3, 3, 4, 6).astype(np.float32)
    packed = _block_diag([k1, k2])
    assert packed.shape == (3, 3, 8, 12)
    x1 = rng.randn(1, 8, 8, 4).astype(np.float32)
    x2 = rng.randn(1, 8, 8, 4).astype(np.float32)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y = conv(np.concatenate([x1, x2], -1), np.asarray(packed))
    np.testing.assert_allclose(y[..., :6], conv(x1, k1), atol=1e-5)
    np.testing.assert_allclose(y[..., 6:], conv(x2, k2), atol=1e-5)


def test_concat_groups_interleaves_per_fold():
    # two folds, parts of width 2 and 1 per fold
    a = jnp.asarray(np.arange(2 * 1 * 1 * 4).reshape(1, 1, 2, 4))
    b = jnp.asarray(np.arange(100, 100 + 2 * 2).reshape(1, 1, 2, 2))
    out = np.asarray(_concat_groups([a, b], folds=2))
    assert out.shape == (1, 1, 2, 6)
    # fold 0: a[:2] then b[0]; fold 1: a[2:4] then b[1]
    np.testing.assert_array_equal(out[0, 0, 0], [0, 1, 100, 2, 3, 101])


def test_auto_engine_resolution(reference_models_dir):
    """engine='auto' picks the measured batch-size crossover (BASELINE.md
    'Fold-packed ensemble'): packed below B=96, fold-scan fused above;
    injected variables (driver dryrun) fall back to the xla fold-vmap."""
    ckpts = [str(reference_models_dir / f"espnet_fold{k}.pth")
             for k in (1, 3)]
    cfg = EnsembleConfig(checkpoints=ckpts, folds=(1, 3), batch_size=8)
    assert EnsembleSegmenter(cfg, engine="auto").engine == "packed"
    big = EnsembleConfig(checkpoints=ckpts, folds=(1, 3), batch_size=128)
    assert EnsembleSegmenter(big, engine="auto").engine == "fused"
    injected = EnsembleSegmenter(cfg, engine="xla")
    via_auto = EnsembleSegmenter(cfg, engine="auto",
                                 variables=injected.variables)
    assert via_auto.engine == "xla"


@pytest.mark.parametrize("level3", ["xla", "pallas"])
def test_packed_matches_fold_scan_ensemble(reference_models_dir, level3):
    ckpts = [str(reference_models_dir / f"espnet_fold{k}.pth")
             for k in (1, 3)]
    cfg = EnsembleConfig(checkpoints=ckpts, folds=(1, 3), batch_size=2,
                         compute_dtype="float32", precision="highest")
    reference = EnsembleSegmenter(cfg)  # xla fold-scan engine
    packed = EnsembleSegmenter(cfg, engine="packed")
    if level3 == "pallas":
        # batch_size < 96 already selects pallas; make the other variant
        packed._packed.level3 = level3
    else:
        from glomeruli_segmentation_tpu.models.espnet_packed import (
            PackedEnsembleESPNet,
        )
        from glomeruli_segmentation_tpu.convert.espnet_import import (
            load_espnet_variables,
        )

        means = [FOLD_NORMALIZATION[f][0] for f in (1, 3)]
        stds = [FOLD_NORMALIZATION[f][1] for f in (1, 3)]
        packed._packed = PackedEnsembleESPNet(
            [load_espnet_variables(c) for c in ckpts], means, stds,
            level3="xla", interpret=True, compute_dtype="float32",
            precision="highest")

    rng = np.random.RandomState(7)
    img = np.clip(np.full((2, 320, 448, 3), (200, 170, 205))
                  + rng.randint(-25, 25, (2, 320, 448, 3)), 0,
                  255).astype(np.uint8)
    hs = np.full(2, 320, np.int32)
    ws = np.full(2, 448, np.int32)
    a = reference.segment_batch_padded(img, hs, ws)
    b = packed.segment_batch_padded(img, hs, ws)
    assert a.shape == b.shape == (2, 512, 1024)
    # identical nonzero terms in every contraction; only accumulation
    # order differs -> argmax must agree except at exact ties
    disagree = (a != b).mean()
    assert disagree < 1e-3, disagree


@pytest.mark.parametrize("pack_taps", [False, True])
def test_packed_level2_pallas_matches_xla(reference_models_dir, pack_taps):
    """The packed level-2 blocks through the fused Pallas ESP kernel
    (block-diagonal 320-ch form) vs the packed XLA path: identical math,
    different accumulation order only.  Covers both tap layouts of the
    strip-DMA kernel (``level2_pack_taps``)."""
    from glomeruli_segmentation_tpu.convert.espnet_import import (
        load_espnet_variables,
    )

    folds = (1, 4)
    trees = [load_espnet_variables(
        str(reference_models_dir / f"espnet_fold{k}.pth")) for k in folds]
    means = [FOLD_NORMALIZATION[f][0] for f in folds]
    stds = [FOLD_NORMALIZATION[f][1] for f in folds]
    kw = dict(level3="xla", interpret=True, compute_dtype="float32",
              precision="highest")
    ref = PackedEnsembleESPNet(trees, means, stds, level2="xla", **kw)
    fused = PackedEnsembleESPNet(trees, means, stds, level2="pallas",
                                 level2_pack_taps=pack_taps, **kw)

    rng = np.random.RandomState(11)
    # 256x1024 input -> level-2 extent 64x256 -> w_tile 128, TWO tiles:
    # exercises the private halo strips around the block-diagonal reduce
    img = np.clip(np.full((1, 256, 1024, 3), (200, 170, 205))
                  + rng.randint(-25, 25, (1, 256, 1024, 3)), 0,
                  255).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        a = np.asarray(ref.packed_logits(jnp.asarray(img)))
        b = np.asarray(fused.packed_logits(jnp.asarray(img)))
    np.testing.assert_allclose(a, b, atol=2e-3, rtol=1e-2)
    np.testing.assert_array_equal(a.argmax(-1), b.argmax(-1))


def test_packed_logits_match_per_fold_fused(reference_models_dir):
    """Packed (B,H,W,F,C) logits vs each fold's FusedESPNet logits."""
    from glomeruli_segmentation_tpu.convert.espnet_import import (
        load_espnet_variables,
    )
    from glomeruli_segmentation_tpu.models.espnet_fused import FusedESPNet

    folds = (2, 5)
    trees = [load_espnet_variables(
        str(reference_models_dir / f"espnet_fold{k}.pth")) for k in folds]
    means = [FOLD_NORMALIZATION[f][0] for f in folds]
    stds = [FOLD_NORMALIZATION[f][1] for f in folds]
    packed = PackedEnsembleESPNet(trees, means, stds, level3="xla",
                                  interpret=True, compute_dtype="float32",
                                  precision="highest")

    rng = np.random.RandomState(3)
    img = np.clip(np.full((1, 128, 256, 3), (200, 170, 205))
                  + rng.randint(-25, 25, (1, 128, 256, 3)), 0,
                  255).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        got = np.asarray(packed.packed_logits(jnp.asarray(img)))
    assert got.shape == (1, 128, 256, 2, 5)
    for i, (tree, mean, std) in enumerate(zip(trees, means, stds)):
        net = FusedESPNet(tree, interpret=True, fuse_level3=False)
        x = (img - np.asarray(mean, np.float32)) \
            / np.asarray(std, np.float32) / 255.0
        with jax.default_matmul_precision("highest"):
            ref = np.asarray(net(jnp.asarray(x)))
        np.testing.assert_allclose(got[..., i, :], ref, atol=2e-3,
                                   rtol=1e-2)
        np.testing.assert_array_equal(got[..., i, :].argmax(-1),
                                      ref.argmax(-1))
