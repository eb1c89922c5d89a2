"""Fine-tune the reference's OD-API inception_v2 Faster R-CNN natively.

The reference only ships/loads the frozen ``frozen_inference_graph.pb``
(``module/faster-rcnn/detect_glomus_test.py:420-456``); its training
lived in the separate ``jinseikenai/glomeruli_detection`` repo pulled in
by the Docker overlay (SURVEY.md §0).  This module provides that
capability natively: starting from the imported frozen-graph weights
(or any assembled OD-API parameter tree), it trains the exact
architecture the reference runs — :class:`..models.od_api_frcnn.
ODAPIFasterRCNN` — with the standard two-stage losses
(:mod:`.detector_train`), sampling annotated-slide windows exactly like
the native driver (:class:`.detector_driver.SlideWindowSampler`).

BN was folded into the conv weights at import (``convert/pb_import.py``),
so fine-tuning updates the folded scale/shift with frozen normalization
statistics — the usual frozen-BN fine-tuning regime for detection.

The result is saved as ``od_api_detector.ckpt.pth`` (torch-format legacy
pickle, like every artifact here) and loads through the detect CLI's
``load_backend`` just like a downloaded ``.pb``.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from .detector_driver import DetectorTrainConfig, SlideWindowSampler

OD_API_CKPT_NAME = "od_api_detector.ckpt.pth"


def finetune_od_api(staining: str, data_dir: str, target_list: str,
                    output_dir: str,
                    config: Optional[DetectorTrainConfig] = None,
                    pb_path: Optional[str] = None,
                    consts=None, params=None,
                    num_classes: Optional[int] = None,
                    od_config_overrides: Optional[dict] = None,
                    log_every: int = 50, data_parallel: int = 0) -> str:
    """Fine-tune OD-API weights on annotated slides; returns the saved
    checkpoint path.  Initial weights come from ``pb_path`` (a downloaded
    frozen graph), ``consts`` (pre-extracted constants), or ``params``
    (an already-assembled tree + ``num_classes``)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..convert.pb_import import (
        assemble_od_api_params,
        load_od_api_detector_params,
    )
    from ..convert.torch_pickle import save_torch_legacy
    from ..models.od_api_frcnn import ODAPIConfig, ODAPIFasterRCNN
    from .detector_train import detector_loss

    if params is not None:
        assert num_classes is not None, "params requires num_classes"
    elif consts is not None:
        params, num_classes = assemble_od_api_params(consts)
    else:
        params, num_classes = load_od_api_detector_params(pb_path)

    config = config or DetectorTrainConfig()
    overrides = dict(od_config_overrides or {})
    # a training step differentiates through all max_proposals ROI crops
    # at once; the inference default (300) is needlessly wide for loss
    # sampling and dominates memory — 64 matches common fine-tune setups
    overrides.setdefault("max_proposals", 64)
    od_config = ODAPIConfig(
        num_classes=num_classes,
        image_size=(config.image_size, config.image_size), **overrides)
    # f32 end-to-end: bf16 gradients through the folded-BN trunk lose the
    # small fine-tuning updates
    model = ODAPIFasterRCNN(params, od_config, compute_dtype="float32")

    sampler = SlideWindowSampler(staining, data_dir, target_list, config)
    rng = np.random.default_rng(config.seed)

    tx = optax.adam(config.lr)
    # reuse the tree the model already converted to device arrays — every
    # training call overrides params explicitly, so a second copy would
    # just double the trunk's HBM footprint for the whole run
    train_params = model.params
    # drop the model's baked reference so the pre-training tree can be
    # freed once the first optimizer update replaces train_params (every
    # call below passes params explicitly)
    model.params = None
    opt_state = tx.init(train_params)

    def step(p, opt_state, x, gb, gc, gv):
        def loss_fn(pp):
            out = model.train_outputs(x, params=pp)
            losses = detector_loss(model.anchors, out, gb, gc, gv)
            return losses["total"], losses

        (_, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p)
        updates, opt_state2 = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state2, losses

    from .detector_driver import _jit_detector_step

    step, batch_sharding = _jit_detector_step(
        step, n_state=2, n_batch=4, data_parallel=data_parallel,
        batch_size=config.batch_size)

    for i in range(config.steps):
        x, gb, gc, gv = sampler.sample_batch(rng)
        train_params, opt_state, losses = step(
            train_params, opt_state,
            jax.device_put(np.asarray(x, np.float32), batch_sharding),
            jax.device_put(gb, batch_sharding),
            jax.device_put(gc, batch_sharding),
            jax.device_put(gv, batch_sharding))
        if i % log_every == 0:
            print(f"step {i}: " + ", ".join(
                f"{k}={float(v):.4f}" for k, v in losses.items()))

    os.makedirs(output_dir, exist_ok=True)
    ckpt_path = os.path.join(output_dir, OD_API_CKPT_NAME)
    save_torch_legacy({
        "od_api_params": jax.tree.map(np.asarray, train_params),
        "num_classes": num_classes,
        "od_config": dataclasses.asdict(od_config),
    }, ckpt_path)
    return ckpt_path


def load_od_api_checkpoint(ckpt_path: str):
    """Read an ``od_api_detector.ckpt.pth`` back into (params, num_classes,
    config_dict)."""
    import jax
    import jax.numpy as jnp

    from ..convert.torch_pickle import load_torch_pickle

    blob = load_torch_pickle(ckpt_path)
    params = jax.tree.map(jnp.asarray, blob["od_api_params"])
    return params, int(blob["num_classes"]), dict(blob.get("od_config", {}))
