"""Mesh-sharded ensemble inference on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

from glomeruli_segmentation_tpu.parallel.mesh import make_mesh
from glomeruli_segmentation_tpu.pipeline.fused import (
    EnsembleConfig,
    EnsembleSegmenter,
)


@pytest.mark.slow
def test_sharded_matches_unsharded(reference_models_dir):
    import jax

    assert len(jax.devices()) == 8
    ckpts = [str(reference_models_dir / f"espnet_fold{k}.pth")
             for k in (1, 2)]
    cfg = EnsembleConfig(checkpoints=ckpts, folds=(1, 2), batch_size=8,
                         compute_dtype="float32", precision="highest")
    mesh = make_mesh(8)
    sharded = EnsembleSegmenter(cfg, mesh=mesh)
    plain = EnsembleSegmenter(cfg)

    rng = np.random.RandomState(0)
    padded = np.clip(np.full((8, 256, 320, 3), (200, 170, 205))
                     + rng.randint(-20, 20, (8, 256, 320, 3)), 0,
                     255).astype(np.uint8)
    hs = np.full(8, 256, np.int32)
    ws = np.full(8, 320, np.int32)
    a = sharded.segment_batch_padded(padded, hs, ws)
    b = plain.segment_batch_padded(padded, hs, ws)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_sharded_packed_matches_unsharded(reference_models_dir):
    """The fold-packed engine under a data mesh: sharded == unsharded."""
    ckpts = [str(reference_models_dir / f"espnet_fold{k}.pth")
             for k in (1, 2)]
    cfg = EnsembleConfig(checkpoints=ckpts, folds=(1, 2), batch_size=8,
                         compute_dtype="float32", precision="highest")
    sharded = EnsembleSegmenter(cfg, mesh=make_mesh(8), engine="packed")
    plain = EnsembleSegmenter(cfg, engine="packed")

    rng = np.random.RandomState(1)
    padded = np.clip(np.full((8, 256, 320, 3), (200, 170, 205))
                     + rng.randint(-20, 20, (8, 256, 320, 3)), 0,
                     255).astype(np.uint8)
    hs = np.full(8, 256, np.int32)
    ws = np.full(8, 320, np.int32)
    a = sharded.segment_batch_padded(padded, hs, ws)
    b = plain.segment_batch_padded(padded, hs, ws)
    np.testing.assert_array_equal(a, b)
