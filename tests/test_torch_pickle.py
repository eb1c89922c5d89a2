"""Tests for the torch-free checkpoint reader."""
import numpy as np
import pytest

from glomeruli_segmentation_tpu.convert import load_torch_pickle

torch = pytest.importorskip("torch")


def test_roundtrip_modern_zip(tmp_path):
    sd = {
        "a.weight": torch.randn(4, 3, 3, 3),
        "a.bias": torch.arange(5, dtype=torch.long),
        "b.scalar": torch.tensor(3, dtype=torch.long),
        "c.half": torch.randn(2, 2).half(),
    }
    p = tmp_path / "modern.pth"
    torch.save(sd, p)
    loaded = load_torch_pickle(str(p))
    assert set(loaded) == set(sd)
    for k, v in sd.items():
        np.testing.assert_array_equal(loaded[k], v.numpy())


def test_roundtrip_legacy_format(tmp_path):
    sd = {
        "w": torch.randn(3, 7),
        "n": torch.tensor(42, dtype=torch.long),
    }
    p = tmp_path / "legacy.pth"
    torch.save(sd, p, _use_new_zipfile_serialization=False)
    loaded = load_torch_pickle(str(p))
    np.testing.assert_array_equal(loaded["w"], sd["w"].numpy())
    assert int(loaded["n"]) == 42


def test_noncontiguous_stride(tmp_path):
    base = torch.randn(6, 8)
    sd = {"t": base.t()}  # transposed view -> non-default strides
    p = tmp_path / "strided.pth"
    torch.save(sd, p, _use_new_zipfile_serialization=False)
    loaded = load_torch_pickle(str(p))
    np.testing.assert_array_equal(loaded["t"], base.t().numpy())


def test_reference_fold_checkpoints(reference_models_dir):
    for fold in range(1, 6):
        sd = load_torch_pickle(str(reference_models_dir / f"espnet_fold{fold}.pth"))
        # 5-class, p=2, q=8 full encoder+decoder (SURVEY.md §2.1)
        assert sd["encoder.classifier.conv.weight"].shape == (5, 256, 1, 1)
        assert sd["classifier.weight"].shape == (5, 5, 2, 2)
        assert sd["encoder.level2.1.c1.conv.weight"].shape == (12, 64, 1, 1)
        assert sd["encoder.level3.7.c1.conv.weight"].shape == (25, 128, 1, 1)
        # cross-check against torch's own loader
        ref = torch.load(str(reference_models_dir / f"espnet_fold{fold}.pth"),
                         map_location="cpu", weights_only=False)
        assert set(sd) == set(ref)
        for k in sd:
            np.testing.assert_array_equal(np.asarray(sd[k]), ref[k].numpy())


def test_malicious_global_rejected(tmp_path):
    """Checkpoints are untrusted downloads: a pickle whose stream smuggles
    an arbitrary global (the classic os.system gadget) must raise — never
    import or execute it.  Covers both the main pickle and the legacy
    prelude sections, which are attacker-controlled bytes too."""
    import pickle

    marker = tmp_path / "pwned"

    class Evil:
        def __reduce__(self):
            import os

            return (os.system, (f"touch {marker}",))

    # gadget in the prelude (first pickle section of the legacy stream)
    p1 = tmp_path / "evil_prelude.pth"
    p1.write_bytes(pickle.dumps(Evil()))
    with pytest.raises(Exception) as ei:
        load_torch_pickle(str(p1))
    assert "refusing to unpickle" in str(ei.value)
    assert not marker.exists()

    # gadget in the main section, behind a valid prelude
    import struct as _struct

    from glomeruli_segmentation_tpu.convert.torch_pickle import (
        _LEGACY_MAGIC,
    )

    p2 = tmp_path / "evil_main.pth"
    blob = (pickle.dumps(_LEGACY_MAGIC) + pickle.dumps(1001)
            + pickle.dumps({"little_endian": True})
            + pickle.dumps(Evil()))
    p2.write_bytes(blob)
    with pytest.raises(Exception) as ei:
        load_torch_pickle(str(p2))
    assert "refusing to unpickle" in str(ei.value)
    assert not marker.exists()


def test_corrupt_checkpoint_fails_cleanly(tmp_path):
    """Byte-corruption fuzz over a real legacy checkpoint: truncations and
    random flips must raise a clean exception or load something — never
    hang or demand an implausible allocation."""
    import os
    import time

    src = "/root/reference/models/espnet_fold1.pth"
    if not os.path.isfile(src):
        pytest.skip("shipped fold checkpoints unavailable")
    base = open(src, "rb").read()
    rng = np.random.RandomState(0)
    cases = [base[:16], base[: len(base) // 3], base[: 2 * len(base) // 3]]
    for k in range(40):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        cases.append(bytes(buf))
    for i, data in enumerate(cases):
        path = str(tmp_path / f"c{i}.pth")
        with open(path, "wb") as fh:
            fh.write(data)
        t0 = time.time()
        try:
            load_torch_pickle(path)
        except Exception:
            pass
        assert time.time() - t0 < 30, f"loader stalled on case {i}"
