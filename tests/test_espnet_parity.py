"""ESPNet structural and numerical parity tests against the reference."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glomeruli_segmentation_tpu.convert.espnet_import import (
    infer_architecture,
    load_espnet_variables,
)
from glomeruli_segmentation_tpu.convert.torch_pickle import load_torch_pickle
from glomeruli_segmentation_tpu.models.espnet import ESPNet, ESPNetEncoder

REF_ESPNET_DIR = "/root/reference/module/espnet/train"


def _tree_shapes(tree):
    return jax.tree.map(lambda a: tuple(a.shape), tree)


def test_imported_tree_matches_init_tree(reference_models_dir):
    sd = load_torch_pickle(str(reference_models_dir / "espnet_fold1.pth"))
    classes, p, q, decoder = infer_architecture(sd)
    assert (classes, p, q, decoder) == (5, 2, 8, True)
    variables = load_espnet_variables(str(reference_models_dir / "espnet_fold1.pth"))

    model = ESPNet(classes=classes, p=p, q=q)
    init_vars = model.init(jax.random.key(0), jnp.zeros((1, 64, 128, 3)))

    got = _tree_shapes(variables)
    want = _tree_shapes(init_vars)
    assert got == want


def test_forward_shapes():
    model = ESPNet(classes=5, p=2, q=8)
    x = jnp.zeros((2, 64, 128, 3))
    variables = model.init(jax.random.key(0), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 64, 128, 5)

    enc = ESPNetEncoder(classes=5, p=2, q=8)
    variables = enc.init(jax.random.key(0), x)
    y = enc.apply(variables, x)
    assert y.shape == (2, 8, 16, 5)


@pytest.fixture(scope="module")
def torch_reference_model():
    torch = pytest.importorskip("torch")
    import pathlib
    if not pathlib.Path(REF_ESPNET_DIR).is_dir():
        pytest.skip("reference tree unavailable")
    sys.path.insert(0, REF_ESPNET_DIR)
    try:
        import Model as RefNet  # noqa: N813
    finally:
        sys.path.pop(0)
    return torch, RefNet


@pytest.mark.parametrize("fold", [1, 3, 5])
def test_numerical_parity_full_net(torch_reference_model, reference_models_dir, fold):
    torch, RefNet = torch_reference_model
    ckpt = str(reference_models_dir / f"espnet_fold{fold}.pth")

    ref = RefNet.ESPNet(classes=5, p=2, q=8)
    ref.load_state_dict(torch.load(ckpt, map_location="cpu", weights_only=False))
    ref.eval()

    rng = np.random.RandomState(fold)
    x = rng.randn(1, 64, 128, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    model = ESPNet(classes=5, p=2, q=8)
    variables = load_espnet_variables(ckpt)
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    out = out.transpose(0, 3, 1, 2)

    # fp32 rounding accumulates across ~20 BN layers with tiny running
    # variances; logits are O(25) so 1e-3 is ~1e-5 relative.
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=1e-3)
    # argmax class maps must agree everywhere
    np.testing.assert_array_equal(out.argmax(1), ref_out.argmax(1))


def test_numerical_parity_encoder_only(torch_reference_model, reference_models_dir):
    """Encoder-only path: build an encoder state dict from fold1's encoder keys."""
    torch, RefNet = torch_reference_model
    full = load_torch_pickle(str(reference_models_dir / "espnet_fold1.pth"))
    enc_sd = {k[len("encoder."):]: v for k, v in full.items() if k.startswith("encoder.")}

    ref = RefNet.ESPNet_Encoder(classes=5, p=2, q=8)
    ref.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in enc_sd.items()})
    ref.eval()

    rng = np.random.RandomState(0)
    x = rng.randn(1, 64, 128, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    from glomeruli_segmentation_tpu.convert.espnet_import import state_dict_to_variables
    variables = state_dict_to_variables(enc_sd)
    model = ESPNetEncoder(classes=5, p=2, q=8)
    out = np.asarray(model.apply(variables, jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref_out, rtol=1e-3, atol=1e-3)
