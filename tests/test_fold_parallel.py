"""Fold (ensemble) parallelism: folds sharded over the mesh.

Certifies parallel/fold_parallel.py against an unsharded sequential
fold loop with identical math: exact mode must match bit for bit, psum
mode must agree on every argmax for non-degenerate inputs.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glomeruli_segmentation_tpu.models.espnet import ESPNet
from glomeruli_segmentation_tpu.parallel.fold_parallel import (
    fold_parallel_argmax,
    pad_folds,
)
from glomeruli_segmentation_tpu.parallel.mesh import make_mesh


def _make_ensemble(n_folds, seed=0):
    model = ESPNet(5, 1, 2)
    rng = np.random.RandomState(seed)
    x0 = jnp.zeros((1, 16, 32, 3), jnp.float32)
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[model.init(jax.random.key(k), x0) for k in range(n_folds)])
    mean = jnp.asarray(rng.uniform(150, 220, (n_folds, 3)), jnp.float32)
    std = jnp.asarray(rng.uniform(20, 45, (n_folds, 3)), jnp.float32)
    return model, stacked, mean, std


def _sequential_argmax(model, stacked, mean, std, x):
    """The unsharded reference combine: ordered sum of fold softmaxes."""
    acc = None
    for f in range(mean.shape[0]):
        v = jax.tree.map(lambda a: a[f], stacked)
        xn = ((x - mean[f]) / std[f] / 255.0).astype(jnp.float32)
        with jax.default_matmul_precision("highest"):
            logits = model.apply(v, xn)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        probs = 1.0 * probs  # match the fold-weight multiply (w == 1.0)
        acc = probs if acc is None else acc + probs
    return np.asarray(jnp.argmax(acc, axis=-1).astype(jnp.uint8))


def test_pad_folds_shapes():
    model, stacked, mean, std = _make_ensemble(5)
    vars_p, mean_p, std_p, w = pad_folds(stacked, mean, std, 8)
    assert mean_p.shape == (8, 3) and std_p.shape == (8, 3)
    assert w.tolist() == [1.0] * 5 + [0.0] * 3
    leaf = jax.tree.leaves(vars_p)[0]
    assert leaf.shape[0] == 8
    # no padding needed when the count already divides
    _, mean_p4, _, w4 = pad_folds(stacked, mean[:4], std[:4], 2)
    assert mean_p4.shape == (4, 3) and w4.tolist() == [1.0] * 4


@pytest.mark.parametrize("n_folds", [5, 3])
def test_fold_parallel_matches_sequential(n_folds):
    """5 folds over 8 devices (zero-weight pads) and 3 folds over 8."""
    mesh = make_mesh(8)
    model, stacked, mean, std = _make_ensemble(n_folds)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(0, 255, (2, 16, 32, 3)), jnp.float32)

    expect = _sequential_argmax(model, stacked, mean, std, x)
    got = fold_parallel_argmax(mesh, model, stacked, mean, std, x)
    np.testing.assert_array_equal(np.asarray(got), expect)

    # psum combine: reassociated f32 sum, argmax still agrees here
    got_psum = fold_parallel_argmax(mesh, model, stacked, mean, std, x,
                                    exact=False)
    np.testing.assert_array_equal(np.asarray(got_psum), expect)


def test_fold_parallel_multiple_folds_per_device():
    """6 folds on a 2-device mesh (3 folds per device, no padding)."""
    mesh = make_mesh(2)
    model, stacked, mean, std = _make_ensemble(6, seed=2)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.uniform(0, 255, (1, 16, 32, 3)), jnp.float32)
    expect = _sequential_argmax(model, stacked, mean, std, x)
    got = fold_parallel_argmax(mesh, model, stacked, mean, std, x)
    np.testing.assert_array_equal(np.asarray(got), expect)


def test_fold_parallel_composes_with_data_parallelism():
    """2-D dp x ep mesh: batch sharded over 'data' (2), folds over
    'fold' (4, with zero-weight pads for 5 folds); output equals the
    sequential fold loop on the full batch."""
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("data", "fold"))
    model, stacked, mean, std = _make_ensemble(5, seed=4)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.uniform(0, 255, (4, 16, 32, 3)), jnp.float32)
    expect = _sequential_argmax(model, stacked, mean, std, x)
    got = fold_parallel_argmax(mesh, model, stacked, mean, std, x,
                               axis_name="fold", data_axis="data")
    np.testing.assert_array_equal(np.asarray(got), expect)


def test_fold_parallel_ensemble_reuses_compiled_program():
    """FoldParallelEnsemble builds once: repeat same-shape calls hit the
    jit trace cache (no per-batch retrace/re-upload)."""
    from glomeruli_segmentation_tpu.parallel.fold_parallel import (
        FoldParallelEnsemble,
    )

    mesh = make_mesh(8)
    model, stacked, mean, std = _make_ensemble(3, seed=6)
    ens = FoldParallelEnsemble(mesh, model, stacked, mean, std)
    rng = np.random.RandomState(7)
    x1 = jnp.asarray(rng.uniform(0, 255, (2, 16, 32, 3)), jnp.float32)
    x2 = jnp.asarray(rng.uniform(0, 255, (2, 16, 32, 3)), jnp.float32)
    m1 = np.asarray(ens(x1))
    m2 = np.asarray(ens(x2))
    assert ens._fn._cache_size() == 1
    np.testing.assert_array_equal(
        m1, _sequential_argmax(model, stacked, mean, std, x1))
    np.testing.assert_array_equal(
        m2, _sequential_argmax(model, stacked, mean, std, x2))

    # the data-axis divisibility guard raises the explicit error
    from jax.sharding import Mesh
    mesh2 = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4),
                 ("data", "fold"))
    ens2 = FoldParallelEnsemble(mesh2, model, stacked, mean, std,
                                axis_name="fold", data_axis="data")
    with pytest.raises(ValueError, match="multiple of"):
        ens2(jnp.zeros((3, 16, 32, 3), jnp.float32))
