"""DataLoader prefetch pipeline: parity, abandonment, error propagation.

The loader mirrors the reference's torch DataLoader workers
(/root/reference/module/espnet/train/main.py:331-353): decode runs in a
thread pool and a bounded producer thread stages batches ahead of the
consumer.  Prefetching must not change what is yielded — only when the
host work happens.
"""
import os

import cv2
import numpy as np
import pytest
from PIL import Image

from glomeruli_segmentation_tpu.data.dataset import (
    DataLoader,
    SegmentationDataset,
)


@pytest.fixture()
def toy_tree(tmp_path):
    ims, labs = [], []
    rng = np.random.RandomState(3)
    for i in range(7):
        im = rng.randint(0, 255, (24, 32, 3), np.uint8)
        lab = rng.randint(0, 5, (24, 32)).astype(np.uint8)
        ip = str(tmp_path / f"im{i}.png")
        lp = str(tmp_path / f"lab{i}.png")
        cv2.imwrite(ip, im)
        Image.fromarray(lab, mode="P").save(lp)
        ims.append(ip)
        labs.append(lp)
    return ims, labs


def _collect(loader):
    out = []
    for images, labels in loader:
        out.append((images.copy(), labels.copy()))
    return out


def test_prefetch_yields_identical_batches(toy_tree):
    ims, labs = toy_tree

    def noisy(rng, image, label):
        # rng-consuming transform: seeds must line up across modes
        if rng.random() < 0.5:
            image = image[:, ::-1]
            label = label[:, ::-1]
        return image.astype(np.float32), label.astype(np.int32)

    def mk(prefetch):
        return DataLoader(SegmentationDataset(ims, labs, transform=noisy),
                          batch_size=3, shuffle=True, num_workers=2,
                          seed=11, prefetch=prefetch)

    sync = _collect(mk(0))
    pre1 = _collect(mk(1))
    pre3 = _collect(mk(3))
    assert len(sync) == len(pre1) == len(pre3) == 3
    for (si, sl), (pi, pl), (qi, ql) in zip(sync, pre1, pre3):
        np.testing.assert_array_equal(si, pi)
        np.testing.assert_array_equal(sl, pl)
        np.testing.assert_array_equal(si, qi)
        np.testing.assert_array_equal(sl, ql)


def test_prefetch_epochs_reshuffle_like_sync(toy_tree):
    ims, labs = toy_tree
    a = DataLoader(SegmentationDataset(ims, labs), 3, seed=5, prefetch=2)
    b = DataLoader(SegmentationDataset(ims, labs), 3, seed=5, prefetch=0)
    for _ in range(2):  # epoch counter advances identically
        for (ia, la), (ib, lb) in zip(a, b):
            np.testing.assert_array_equal(ia, ib)
            np.testing.assert_array_equal(la, lb)


def test_abandoned_iterator_does_not_hang(toy_tree):
    ims, labs = toy_tree
    loader = DataLoader(SegmentationDataset(ims, labs), 2, prefetch=1)
    it = iter(loader)
    next(it)
    it.close()  # mid-epoch abandon: producer must unblock and join
    # loader is reusable afterwards
    assert len(_collect(loader)) == len(loader)


def test_decode_error_propagates(toy_tree):
    ims, labs = toy_tree

    def boom(rng, image, label):
        raise RuntimeError("decode failed")

    loader = DataLoader(SegmentationDataset(ims, labs, transform=boom),
                        2, prefetch=2)
    with pytest.raises(RuntimeError, match="decode failed"):
        _collect(loader)
