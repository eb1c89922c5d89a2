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


def test_make_fold_mesh_validation():
    import jax

    from glomeruli_segmentation_tpu.parallel.mesh import make_fold_mesh

    assert len(jax.devices()) == 8
    mesh = make_fold_mesh(4, 2, 8)
    assert mesh.axis_names == ("fold", "data")
    assert mesh.shape["fold"] == 4 and mesh.shape["data"] == 2
    # -1 folds: all devices left after the data axis
    mesh = make_fold_mesh(-1, 2, 8)
    assert mesh.shape["fold"] == 4
    mesh = make_fold_mesh(-1, 0, 8)  # data_parallel 0 -> data axis 1
    assert mesh.shape["fold"] == 8 and mesh.shape["data"] == 1
    with pytest.raises(ValueError, match="multiple of"):
        make_fold_mesh(4, 2, 7)
    with pytest.raises(ValueError, match="available"):
        make_fold_mesh(8, 2, 8)
    with pytest.raises(ValueError, match="explicit"):
        make_fold_mesh(4, -1, 8)


def _ordered_sequential_argmax(seg, padded, hs, ws):
    """The unsharded reference combine for the fold-parallel engine: the
    production dynamic resize, then fold softmaxes summed strictly in
    fold order (the bit-contract of the ordered all_gather combine,
    parallel/fold_parallel.py)."""
    import jax
    import jax.numpy as jnp

    resized = seg._resize_batch(jnp.asarray(padded), jnp.asarray(hs),
                                jnp.asarray(ws))
    acc = None
    for f in range(seg.mean.shape[0]):
        v = jax.tree.map(lambda a: a[f], seg.variables)
        xn = ((resized.astype(jnp.float32) - seg.mean[f])
              / seg.std[f] / 255.0)
        with jax.default_matmul_precision("highest"):
            logits = seg.model.apply(v, xn.astype(jnp.float32))
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        acc = probs if acc is None else acc + probs
    return np.asarray(jnp.argmax(acc, axis=-1).astype(jnp.uint8))


@pytest.mark.slow
def test_fold_parallel_engine_matches_sequential(reference_models_dir):
    """gseg-e2e --fold_parallel's engine: the shipped 5 folds sharded over
    a (4-fold x 2-data) mesh, driven through the production padded submit
    path, == the ordered sequential fold combine bit for bit."""
    from glomeruli_segmentation_tpu.parallel.mesh import make_fold_mesh

    ckpts = [str(reference_models_dir / f"espnet_fold{k}.pth")
             for k in (1, 2, 3, 4, 5)]
    # small network resolution keeps the 5-fold CPU forward cheap; the
    # engine is resolution-agnostic (fully convolutional)
    cfg = EnsembleConfig(checkpoints=ckpts, folds=(1, 2, 3, 4, 5),
                         batch_size=4, in_height=64, in_width=128,
                         compute_dtype="float32", precision="highest")
    mesh = make_fold_mesh(4, 2, cfg.batch_size)
    fp = EnsembleSegmenter(cfg, mesh=mesh, engine="fold_parallel")
    rng = np.random.RandomState(2)
    padded = np.clip(np.full((4, 128, 160, 3), (200, 170, 205))
                     + rng.randint(-25, 25, (4, 128, 160, 3)), 0,
                     255).astype(np.uint8)
    hs = np.full(4, 128, np.int32)
    ws = np.full(4, 160, np.int32)
    got = fp.segment_batch_padded(padded, hs, ws)
    assert got.shape == (4, 64, 128)

    plain = EnsembleSegmenter(cfg, engine="xla")
    expect = _ordered_sequential_argmax(plain, padded, hs, ws)
    np.testing.assert_array_equal(got, expect)

    # the /8 gather path (the production slide program) under the same
    # fold mesh: gathered rows/cols of the full map, bit-identical
    ys = np.tile(np.arange(0, 64, 8, dtype=np.int32), (4, 1))
    xs = np.tile(np.arange(0, 128, 8, dtype=np.int32), (4, 1))
    gathered = fp.segment_batch_gather(padded, hs, ws, ys, xs)
    np.testing.assert_array_equal(np.asarray(gathered),
                                  expect[:, ::8, ::8])


def test_fold_parallel_engine_requires_fold_mesh():
    ckpts = ()
    cfg = EnsembleConfig(checkpoints=ckpts, batch_size=2)
    with pytest.raises(ValueError, match="fold"):
        EnsembleSegmenter(cfg, mesh=make_mesh(8), engine="fold_parallel")
    with pytest.raises(ValueError, match="fold"):
        EnsembleSegmenter(cfg, engine="fold_parallel")
