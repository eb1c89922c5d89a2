"""Fused Pallas ESP kernel + fused inference forward parity tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glomeruli_segmentation_tpu.models.espnet import ESPBlock, ESPNet
from glomeruli_segmentation_tpu.ops.pallas.esp_block import (
    esp_block_fused,
    esp_block_fused_dma,
    fold_bn,
    pack_esp_weights,
)


def test_fold_bn():
    scale = np.asarray([2.0, 1.0])
    bias = np.asarray([1.0, -1.0])
    mean = np.asarray([0.5, 0.0])
    var = np.asarray([4.0, 1.0])
    s, b = fold_bn(scale, bias, mean, var, eps=0.0)
    x = np.asarray([3.0, 2.0])
    want = (x - mean) / np.sqrt(var) * scale + bias
    np.testing.assert_allclose(x * s + b, want)


@pytest.mark.parametrize("c,h,w", [
    (128, 16, 32),   # single tile (H*W under the Mosaic extent wall)
    (64, 32, 64),    # single tile, level-2 channel split (n=12, n1=16)
    (64, 64, 256),   # 2 width tiles: exercises the halo-strip recompute
    (64, 128, 256),  # 4 width tiles: the real level-2 spatial shape
])
def test_esp_block_kernel_matches_flax(c, h, w):
    rng = np.random.RandomState(0)
    x = rng.randn(2, h, w, c).astype(np.float32)
    block = ESPBlock(c)
    variables = block.init(jax.random.key(0), jnp.asarray(x))
    bs = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.5, 2.0, a.shape), a.dtype),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    ref = np.asarray(block.apply(variables, jnp.asarray(x)))
    packed = pack_esp_weights(variables["params"], variables["batch_stats"])
    out = np.asarray(esp_block_fused(jnp.asarray(x), *packed,
                                     interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-2)


@pytest.mark.parametrize("c,h,w,pack_taps", [
    (64, 16, 32, False),    # single tile
    (64, 64, 256, False),   # 2 width tiles (halo strips across DMA'd pad)
    (320, 32, 128, True),   # packed-ensemble channel count (and pack_taps)
])
def test_esp_block_dma_matches_plain_kernel(c, h, w, pack_taps):
    """Strip-DMA variant vs the whole-window kernel: identical math."""
    rng = np.random.RandomState(1)
    x = rng.randn(2, h, w, c).astype(np.float32)
    block = ESPBlock(c)
    variables = block.init(jax.random.key(1), jnp.asarray(x))
    bs = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.5, 2.0, a.shape), a.dtype),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": bs}
    packed = pack_esp_weights(variables["params"], variables["batch_stats"])
    want = np.asarray(esp_block_fused(jnp.asarray(x), *packed,
                                      interpret=True))
    got = np.asarray(esp_block_fused_dma(jnp.asarray(x), *packed,
                                         interpret=True,
                                         pack_taps=pack_taps))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-2)


@pytest.mark.slow
def test_fused_ensemble_engine_matches_xla(reference_models_dir):
    from glomeruli_segmentation_tpu.pipeline.fused import (
        EnsembleConfig,
        EnsembleSegmenter,
    )

    ckpts = [str(reference_models_dir / f"espnet_fold{k}.pth")
             for k in (1, 2)]
    cfg = EnsembleConfig(checkpoints=ckpts, folds=(1, 2), batch_size=2,
                         compute_dtype="float32", precision="highest")
    rng = np.random.RandomState(0)
    padded = np.clip(
        np.full((2, 256, 320, 3), (200, 170, 205))
        + rng.randint(-20, 20, (2, 256, 320, 3)), 0, 255).astype(np.uint8)
    hs = np.full(2, 256, np.int32)
    ws = np.full(2, 320, np.int32)
    a = EnsembleSegmenter(cfg).segment_batch_padded(padded, hs, ws)
    b = EnsembleSegmenter(cfg, engine="fused",
                          interpret=True).segment_batch_padded(padded, hs, ws)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_fused_full_net_matches_flax(reference_models_dir):
    from glomeruli_segmentation_tpu.convert.espnet_import import (
        load_espnet_variables,
    )
    from glomeruli_segmentation_tpu.models.espnet_fused import FusedESPNet

    variables = load_espnet_variables(
        str(reference_models_dir / "espnet_fold1.pth"))
    model = ESPNet(5, 2, 8)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 128, 3).astype(np.float32)
    ref = np.asarray(model.apply(variables, jnp.asarray(x)))
    fused = FusedESPNet(variables, interpret=True)
    out = np.asarray(fused(jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-2)
    np.testing.assert_array_equal(out.argmax(-1), ref.argmax(-1))


def test_fused_full_net_xla_level3_matches_flax(reference_models_dir):
    """fuse_level3=False (level-3 on XLA with folded BN — the winning
    path past the measured batch-128 crossover, BASELINE.md r3) keeps
    argmax parity with the flax reference."""
    from glomeruli_segmentation_tpu.convert.espnet_import import (
        load_espnet_variables,
    )
    from glomeruli_segmentation_tpu.models.espnet_fused import FusedESPNet

    variables = load_espnet_variables(
        str(reference_models_dir / "espnet_fold1.pth"))
    model = ESPNet(5, 2, 8)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 64, 128, 3).astype(np.float32)
    ref = np.asarray(model.apply(variables, jnp.asarray(x)))
    fused = FusedESPNet(variables, interpret=True, fuse_level3=False)
    out = np.asarray(fused(jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-2)
    np.testing.assert_array_equal(out.argmax(-1), ref.argmax(-1))
