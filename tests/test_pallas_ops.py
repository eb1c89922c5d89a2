"""Pallas kernel parity tests (interpret mode on CPU; compiled on TPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from glomeruli_segmentation_tpu.ops.nms import nms
from glomeruli_segmentation_tpu.ops.pallas.nms_pallas import nms_pallas


@pytest.mark.parametrize("seed,n,k", [(1, 120, 128), (2, 64, 16), (3, 256, 300)])
def test_pallas_nms_matches_scan(seed, n, k):
    rng = np.random.RandomState(seed)
    centers = rng.uniform(20, 400, (n, 2))
    sizes = rng.uniform(10, 80, (n, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                           -1).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    ref_idx, ref_num = nms(jnp.asarray(boxes), jnp.asarray(scores), k, 0.5)
    pal_idx, pal_num = nms_pallas(jnp.asarray(boxes), jnp.asarray(scores), k,
                                  0.5, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref_idx), np.asarray(pal_idx))
    assert int(ref_num) == int(pal_num)
