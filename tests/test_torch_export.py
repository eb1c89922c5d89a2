"""Round-trip tests for the legacy checkpoint writer and flax->torch export."""
import numpy as np
import pytest

from glomeruli_segmentation_tpu.convert.espnet_import import (
    load_espnet_variables,
    state_dict_to_variables,
    variables_to_state_dict,
)
from glomeruli_segmentation_tpu.convert.torch_pickle import (
    load_torch_pickle,
    save_torch_legacy,
)

torch = pytest.importorskip("torch")


def test_save_legacy_loadable_by_torch(tmp_path):
    obj = {
        "state_dict": {
            "w": np.random.RandomState(0).randn(3, 4).astype(np.float32),
            "n": np.asarray(7, np.int64),
        },
        "epoch": 12,
        "lr": 5e-4,
    }
    p = tmp_path / "ours.pth.tar"
    save_torch_legacy(obj, str(p))
    loaded = torch.load(str(p), map_location="cpu", weights_only=False)
    assert loaded["epoch"] == 12
    np.testing.assert_array_equal(loaded["state_dict"]["w"].numpy(),
                                  obj["state_dict"]["w"])
    assert int(loaded["state_dict"]["n"]) == 7
    # and by our own reader
    ours = load_torch_pickle(str(p))
    np.testing.assert_array_equal(ours["state_dict"]["w"],
                                  obj["state_dict"]["w"])


def test_flax_to_torch_state_dict_roundtrip(reference_models_dir, tmp_path):
    src = str(reference_models_dir / "espnet_fold2.pth")
    variables = load_espnet_variables(src)
    exported = variables_to_state_dict(variables)
    original = load_torch_pickle(src)
    assert set(exported) == set(original)
    for k in original:
        if k.endswith("num_batches_tracked"):
            continue  # exported as 0; informational counter only
        np.testing.assert_array_equal(exported[k], np.asarray(original[k]),
                                      err_msg=k)

    # exported file is accepted by the reference torch model class
    out = tmp_path / "export.pth"
    save_torch_legacy(exported, str(out))
    import sys
    sys.path.insert(0, "/root/reference/module/espnet/train")
    try:
        import Model as RefNet
    finally:
        sys.path.pop(0)
    ref = RefNet.ESPNet(classes=5, p=2, q=8)
    ref.load_state_dict(torch.load(str(out), map_location="cpu",
                                   weights_only=False))
