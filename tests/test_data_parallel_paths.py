"""User-facing data-parallel paths: sharded == unsharded on the 8-device
CPU mesh (segment forward, both detector backends)."""
import numpy as np
import pytest

from pb_graph_writer import write_graph
from test_od_api_import import build_od_api_consts


@pytest.mark.slow
def test_segmenter_data_parallel_matches(reference_models_dir):
    from glomeruli_segmentation_tpu.pipeline.segment import (
        EspnetSegmenter,
        SegmenterConfig,
    )

    fold1 = str(reference_models_dir / "espnet_fold1.pth")
    mean = (204.60071, 170.19359, 199.57469)
    std = (20.61257, 42.92207, 28.401505)
    kw = dict(weights=fold1, in_width=128, in_height=64, mean=mean, std=std,
              batch_size=8)
    plain = EspnetSegmenter(SegmenterConfig(**kw))
    sharded = EspnetSegmenter(SegmenterConfig(data_parallel=8, **kw))

    rng = np.random.RandomState(0)
    crops = [np.clip(rng.normal(190, 25, (96, 160, 3)), 0, 255
                     ).astype(np.uint8) for _ in range(8)]
    a = plain.segment_images(crops)
    b = sharded.segment_images(crops)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)

    # batch_size not divisible by the mesh -> clean error
    with pytest.raises(ValueError, match="multiple"):
        EspnetSegmenter(SegmenterConfig(
            weights=fold1, batch_size=5, data_parallel=8))


def test_od_api_backend_data_parallel_matches(tmp_path):
    from glomeruli_segmentation_tpu.pipeline.detect import (
        ODAPIDetectorBackend,
    )

    consts, _, _ = build_od_api_consts(seed=8)
    pb = tmp_path / "frozen_inference_graph.pb"
    write_graph(consts, str(pb))

    kw = dict(batch_size=8, compute_dtype="float32", min_dimension=64,
              max_dimension=96, pre_nms_top_n=100, max_proposals=10,
              max_detections=5)
    plain = ODAPIDetectorBackend(str(pb), **kw)
    sharded = ODAPIDetectorBackend(str(pb), data_parallel=8, **kw)

    rng = np.random.RandomState(1)
    images = rng.randint(0, 255, (8, 96, 96, 3), np.uint8)
    b1, s1, c1, n1 = plain.detect_batch(images)
    b2, s2, c2, n2 = sharded.detect_batch(images)
    np.testing.assert_allclose(b1, b2, atol=1e-5)
    np.testing.assert_allclose(s1, s2, atol=1e-5)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(n1, n2)


def test_native_backend_data_parallel_matches():
    import jax
    import jax.numpy as jnp

    from glomeruli_segmentation_tpu.models.faster_rcnn import (
        FasterRCNN,
        FasterRCNNConfig,
        build_anchors,
    )
    from glomeruli_segmentation_tpu.pipeline.detect import JaxDetectorBackend

    cfg = FasterRCNNConfig(backbone="tiny", image_size=(64, 64),
                           pre_nms_top_n=100, post_nms_top_n=10,
                           max_detections=5)
    model = FasterRCNN(cfg)
    anchors = build_anchors(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, anchors)

    kw = dict(config=cfg, batch_size=8, compute_dtype="float32")
    plain = JaxDetectorBackend(variables, **kw)
    sharded = JaxDetectorBackend(variables, data_parallel=8, **kw)

    rng = np.random.RandomState(2)
    images = rng.randint(0, 255, (8, 64, 64, 3), np.uint8)
    b1, s1, c1, n1 = plain.detect_batch(images)
    b2, s2, c2, n2 = sharded.detect_batch(images)
    np.testing.assert_allclose(b1, b2, atol=1e-5)
    np.testing.assert_allclose(s1, s2, atol=1e-5)
    np.testing.assert_array_equal(n1, n2)
