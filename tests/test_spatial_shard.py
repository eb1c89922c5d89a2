"""Spatial sharding (halo-exchange stripes) on the virtual 8-device mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glomeruli_segmentation_tpu.parallel.mesh import make_mesh
from glomeruli_segmentation_tpu.parallel.spatial import spatial_shard_forward


def test_exact_for_local_fn():
    """A 3x3 conv's receptive field fits in overlap=8 -> exact equality."""
    mesh = make_mesh(8)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 64, 32, 4).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 4, 6).astype(np.float32))

    def fn(img):
        return jax.lax.conv_general_dilated(
            img, kernel, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    got = spatial_shard_forward(mesh, fn, x, overlap=8)
    want = fn(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.slow
def test_espnet_spatial_shard_agreement(reference_models_dir):
    """Full ESPNet across stripes: interior argmax agreement (seams are
    approximate beyond the margin, same contract as WSI overlap tiling)."""
    from glomeruli_segmentation_tpu.convert.espnet_import import (
        load_espnet_variables,
    )
    from glomeruli_segmentation_tpu.models.espnet import ESPNet

    from glomeruli_segmentation_tpu.ops.preprocess import preprocess_host
    from glomeruli_segmentation_tpu.wsi.synthetic import pas_like_image

    mesh = make_mesh(4)  # 4 stripes of 128 rows
    variables = load_espnet_variables(
        str(reference_models_dir / "espnet_fold1.pth"))
    model = ESPNet(5, 2, 8)

    img, _ = pas_like_image(512, 128, seed=2, n_glomeruli=3)
    x = preprocess_host(img[:, :, ::-1],
                        [204.60071, 170.19359, 199.57469],
                        [20.61257, 42.92207, 28.401505],
                        width=128, height=512)
    x = jnp.asarray(x[None])

    def fn(i):
        return model.apply(variables, i)

    got = np.asarray(spatial_shard_forward(mesh, fn, x, overlap=64))
    want = np.asarray(model.apply(variables, x))
    assert got.shape == want.shape
    # evaluate away from stripe seams (the overlap-tiling accuracy
    # contract): central half of each 128-row stripe
    rows = np.concatenate([np.arange(s * 128 + 32, s * 128 + 96)
                           for s in range(4)])
    agreement = (got[:, rows].argmax(-1) == want[:, rows].argmax(-1)).mean()
    assert agreement > 0.95, agreement
