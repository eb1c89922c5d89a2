"""SegFormer parity tests against the HF torch implementation."""
import numpy as np
import pytest

import jax.numpy as jnp

from glomeruli_segmentation_tpu.convert.segformer_import import (
    hf_state_dict_to_variables,
)
from glomeruli_segmentation_tpu.models.segformer import (
    Segformer,
    SegformerConfig,
    upsample_logits,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.SegformerConfig(num_labels=5)
    torch.manual_seed(0)
    model = transformers.SegformerForSemanticSegmentation(cfg)
    model.eval()
    return model


def test_forward_parity_with_hf(hf_model):
    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    variables = hf_state_dict_to_variables(sd)
    model = Segformer(SegformerConfig(num_labels=5))

    rng = np.random.RandomState(0)
    x = rng.randn(1, 128, 128, 3).astype(np.float32)
    with torch.no_grad():
        ref = hf_model(pixel_values=torch.from_numpy(
            x.transpose(0, 3, 1, 2))).logits.numpy()
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    ours = ours.transpose(0, 3, 1, 2)
    assert ours.shape == ref.shape  # (1, 5, 32, 32)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(ours.argmax(1), ref.argmax(1))


def test_upsample_matches_torch_interpolate(hf_model):
    rng = np.random.RandomState(1)
    logits = rng.randn(2, 32, 32, 5).astype(np.float32)
    with torch.no_grad():
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(logits.transpose(0, 3, 1, 2)), size=(128, 128),
            mode="bilinear", align_corners=False).numpy()
    ours = np.asarray(upsample_logits(jnp.asarray(logits), 128, 128))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_variable_tree_matches_init(hf_model):
    import jax

    sd = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    variables = hf_state_dict_to_variables(sd)
    model = Segformer(SegformerConfig(num_labels=5))
    init_vars = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    got = jax.tree.map(lambda a: a.shape, variables)
    want = jax.tree.map(lambda a: a.shape, init_vars)
    assert got == want


def test_config_from_variables_roundtrip():
    """Geometry inference: a non-default MiT layout (b2-flavoured widths/
    depths scaled down) recovers from its own init's shapes, so any
    mit-b0..b5 checkpoint loads without a hand-written config."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from glomeruli_segmentation_tpu.models.segformer import (
        config_from_variables,
    )

    # widths divisible by the MiT-family head counts (1, 2, 5, 8)
    cfg = SegformerConfig(num_labels=3, hidden_sizes=(8, 16, 40, 64),
                          depths=(1, 2, 2, 1), sr_ratios=(8, 4, 2, 1),
                          patch_sizes=(7, 3, 3, 3), mlp_ratio=2,
                          decoder_hidden_size=32)
    model = Segformer(cfg)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 64, 64, 3), jnp.float32))
    inferred = config_from_variables(variables)
    assert inferred == cfg
    # num_labels override wins over the classifier width (transfer case)
    assert config_from_variables(variables, num_labels=7) == \
        dataclasses.replace(cfg, num_labels=7)


def test_config_from_variables_on_hf_import(hf_model):
    from glomeruli_segmentation_tpu.models.segformer import (
        config_from_variables,
    )

    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    variables = hf_state_dict_to_variables(sd)
    assert config_from_variables(variables) == SegformerConfig(num_labels=5)
