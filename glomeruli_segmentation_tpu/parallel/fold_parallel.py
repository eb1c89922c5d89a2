"""Ensemble (fold) parallelism: fold networks sharded over mesh devices.

The reference evaluates five per-fold ESPNet checkpoints and combines
their predictions per slide (``module/espnet/test/eval_wsi_segmentation.py``
drives one fold per invocation; the fused pipeline's probability-mean
combine lives in ``pipeline/fused.py``).  Data parallelism replicates all
five folds on every device and splits the crop batch; this module is the
orthogonal axis — the *folds* shard over the mesh ("expert" parallelism in
mesh terms):

- each device holds only its fold slice of the stacked checkpoint pytree
  (1/n of the weight memory),
- every device runs the full crop batch through its local folds,
- the per-fold probability maps are summed with one ``psum`` over ICI and
  the argmax is taken on the replicated sum.

The fold count rarely matches the device count, so the stacked weights are
padded to a multiple of the axis size with zero-weighted duplicates — the
padded folds' probabilities are multiplied by 0.0 before the combine (the
mean-vs-sum distinction cannot flip an argmax).  Two combine modes:

- ``exact=True`` (default): ``all_gather`` the per-fold probability maps
  and add them strictly in fold order — bit-identical to the unsharded
  sequential fold loop (zero-weighted pads contribute exact +0.0).
- ``exact=False``: one ``psum`` — fewer ICI bytes, but the reduction may
  reassociate the f32 sum (same accuracy contract as the data-parallel
  loss psum).

Latency motivation: at small crop batches the ensemble is latency-bound
(BASELINE.md "Round-3 device profile": ~60 ms fixed cost per fold), so on
an n-chip slice fold parallelism cuts the fixed cost ~F-fold where data
parallelism cannot (a B=8 batch split 8 ways leaves each chip
latency-bound on all 5 folds).  Compose with data parallelism by building
a 2-D mesh and passing its fold axis name here.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        from jax import shard_map  # jax >= 0.8
        kwargs = {"check_vma": False}
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
        kwargs = {"check_rep": False}  # pre-0.8 kwarg name
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     **kwargs)


def pad_folds(stacked_vars: Any, mean: jax.Array, std: jax.Array,
              n_dev: int):
    """Pad a fold-leading stacked pytree to a multiple of ``n_dev`` folds.

    Returns (padded_vars, padded_mean, padded_std, fold_weights) where
    ``fold_weights`` is 1.0 for real folds and 0.0 for the duplicated
    padding folds.
    """
    n_folds = mean.shape[0]
    pad = (-n_folds) % n_dev

    def pad_leading(a):
        if pad == 0:
            return a
        return jnp.concatenate([a, jnp.repeat(a[:1], pad, axis=0)], axis=0)

    weights = jnp.concatenate([jnp.ones((n_folds,), jnp.float32),
                               jnp.zeros((pad,), jnp.float32)])
    return (jax.tree.map(pad_leading, stacked_vars), pad_leading(mean),
            pad_leading(std), weights)


def build_fold_parallel_fn(mesh: Mesh, model, *, axis_name: str = "data",
                           data_axis: str | None = None,
                           compute_dtype=jnp.float32,
                           precision: str = "highest",
                           exact: bool = True):
    """The un-jitted shard_map'd fold-parallel program:
    ``fn(vars_l, mean_l, std_l, wf_l, x) -> (B, H, W) uint8 argmax``.

    Weight operands are fold-sharded over ``axis_name`` (pad with
    :func:`pad_folds` first), ``x`` is replicated or sharded over
    ``data_axis``.  Returned un-jitted so callers can embed it inside a
    larger jitted program (:class:`...pipeline.fused.EnsembleSegmenter`
    engine=\"fold_parallel\" calls it after its on-device dynamic resize);
    :class:`FoldParallelEnsemble` wraps it in its own ``jax.jit``."""
    classes = model.classes

    def local(vars_l, mean_l, std_l, wf_l, x):
        # vars_l: this device's fold slice (per folds leading);
        # x: the full batch (or its data_axis shard)
        def fold_probs(inputs):
            v, m, s, w = inputs
            xn = ((x - m) / s / 255.0).astype(compute_dtype)
            with jax.default_matmul_precision(precision):
                logits = model.apply(v, xn)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return w * probs

        if exact:
            # gather every fold's probability map and add strictly in
            # fold order: bit-identical to the unsharded sequential
            # fold loop (zero-weighted pads contribute exact +0.0)
            _, probs_l = jax.lax.scan(
                lambda _, inp: (None, fold_probs(inp)), None,
                (vars_l, mean_l, std_l, wf_l))
            parts = jax.lax.all_gather(probs_l, axis_name, axis=0)
            # (n_dev, per, B, H, W, C) -> ordered fold-major flat view
            flat = parts.reshape((-1,) + parts.shape[2:])
            acc = flat[0]
            for i in range(1, flat.shape[0]):
                acc = acc + flat[i]
        else:
            def body(acc, inputs):
                return acc + fold_probs(inputs), None

            init = jnp.zeros(x.shape[:3] + (classes,), jnp.float32)
            acc, _ = jax.lax.scan(body, init,
                                  (vars_l, mean_l, std_l, wf_l))
            acc = jax.lax.psum(acc, axis_name)
        return jnp.argmax(acc, axis=-1).astype(jnp.uint8)

    fold = P(axis_name)
    batch_spec = P() if data_axis is None else P(data_axis)
    return _shard_map(local, mesh,
                      in_specs=(fold, fold, fold, fold, batch_spec),
                      out_specs=batch_spec)


class FoldParallelEnsemble:
    """Reusable fold-sharded combine: pads and uploads the fold weights
    and jits the shard_map'd program ONCE at construction; each call then
    only stages the batch and dispatches (per-batch re-pad/re-upload/
    retrace would dwarf the fixed-cost latency this axis exists to cut,
    especially through a remote-AOT compile service).

    Args:
      model: the per-fold flax module (ESPNet).
      stacked_vars: fold-leading stacked variable pytree (F on axis 0).
      mean/std: (F, 3) per-fold BGR normalization (README.md:243-249 of
        the reference).
      compute_dtype: dtype of the normalized input.  For genuine bf16
        *compute* build the model with ``dtype=jnp.bfloat16`` as well —
        an input-only cast promotes back to f32 at the first f32-param
        conv (flax ``dtype=None`` promotes).
      exact: ordered all_gather combine (bit-identical to the unsharded
        fold loop) vs a reassociating psum.
      data_axis: optional second mesh axis to shard the *batch* over —
        the 2-D dp x ep composition: each (data, fold) submesh cell runs
        its batch shard through its fold slice; the fold combine rides
        only ``axis_name``, so no cross-batch collective is needed.
    """

    def __init__(self, mesh: Mesh, model, stacked_vars: Any,
                 mean: jax.Array, std: jax.Array, *,
                 axis_name: str = "data", data_axis: str | None = None,
                 compute_dtype=jnp.float32, precision: str = "highest",
                 exact: bool = True):
        n_dev = mesh.shape[axis_name]
        vars_p, mean_p, std_p, wf = pad_folds(stacked_vars, mean, std,
                                              n_dev)
        # jit the shard_map'd program so repeat calls hit the trace cache
        self._fn = jax.jit(build_fold_parallel_fn(
            mesh, model, axis_name=axis_name, data_axis=data_axis,
            compute_dtype=compute_dtype, precision=precision, exact=exact))
        shard = NamedSharding(mesh, P(axis_name))
        self._weights = (jax.device_put(vars_p, shard),
                         jax.device_put(mean_p, shard),
                         jax.device_put(std_p, shard),
                         jax.device_put(wf, shard))
        self._batch_sharding = NamedSharding(
            mesh, P() if data_axis is None else P(data_axis))
        self._data_div = (mesh.shape[data_axis]
                          if data_axis is not None else 1)
        self._data_axis = data_axis

    def __call__(self, resized: jax.Array) -> jax.Array:
        """(B, H, W, 3) float crops at network resolution -> (B, H, W)
        uint8 class maps (replicated, or sharded over ``data_axis``)."""
        if resized.shape[0] % self._data_div:
            raise ValueError(
                f"batch size {resized.shape[0]} must be a multiple of "
                f"the '{self._data_axis}' axis size {self._data_div}")
        return self._fn(*self._weights,
                        jax.device_put(resized, self._batch_sharding))


def fold_parallel_argmax(mesh: Mesh, model, stacked_vars: Any,
                         mean: jax.Array, std: jax.Array,
                         resized: jax.Array, *, axis_name: str = "data",
                         data_axis: str | None = None,
                         compute_dtype=jnp.float32,
                         precision: str = "highest",
                         exact: bool = True) -> jax.Array:
    """One-shot convenience wrapper around :class:`FoldParallelEnsemble`
    (tests / the driver dryrun); production callers should construct the
    class once and call it per batch."""
    return FoldParallelEnsemble(
        mesh, model, stacked_vars, mean, std, axis_name=axis_name,
        data_axis=data_axis, compute_dtype=compute_dtype,
        precision=precision, exact=exact)(resized)
