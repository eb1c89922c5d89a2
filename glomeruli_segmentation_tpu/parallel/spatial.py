"""Spatial partitioning of one large tile across the device mesh.

The reference's "long context" problem is gigapixel spatial extent, and its
universal mechanism is overlap tiling + stitching (SURVEY.md §5.7:
detection windows with ``OVERLAP_RATIO``, eval windows with margin-aware
pasting).  This module lifts that same mechanism onto the mesh: one large
image is split into horizontal stripes across the 'data' axis, each device
receives its stripe plus an overlap margin from its neighbours (halo
exchange with ``jax.lax.ppermute`` over ICI), runs the network locally, and
the center crops are reassembled with ``all_gather``.

Like every overlap-tiled WSI pipeline, the result is exact wherever the
network's receptive field fits inside the margin and approximate at stripe
seams beyond it — the identical accuracy contract the reference's
window-based detection/stitching already accepts.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def spatial_shard_forward(mesh: Mesh, fn: Callable, x: jax.Array,
                          overlap: int, axis_name: str = "data") -> jax.Array:
    """Apply ``fn`` to ``x`` with the H axis sharded across the mesh.

    Args:
      fn: shift-invariant (N, h, W, C) -> (N, h, W, C') network forward
          (stride-1 output resolution; e.g. the full ESPNet).
      x:  (N, H, W, C) with H divisible by the data-axis size.
      overlap: margin rows exchanged with each neighbour; larger margins
          push the seam approximation further out.
    Returns (N, H, W, C') assembled output, fully replicated.
    """
    n_dev = mesh.shape[axis_name]
    n, h, w, c = x.shape
    assert h % n_dev == 0, (h, n_dev)
    stripe = h // n_dev
    assert 0 < overlap <= stripe

    try:
        from jax import shard_map  # jax >= 0.8
        relax_kwargs = {"check_vma": False}
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
        relax_kwargs = {"check_rep": False}  # pre-0.8 kwarg name

    def local(x_local):
        # x_local: (N, stripe, W, C) — this device's stripe
        idx = jax.lax.axis_index(axis_name)
        top_edge = x_local[:, :overlap]       # sent to the upper neighbour
        bot_edge = x_local[:, -overlap:]      # sent to the lower neighbour
        # neighbour exchange over ICI; edge devices receive zeros (image
        # boundary), matching conv zero padding
        up = [(i, i - 1) for i in range(1, n_dev)]
        down = [(i, i + 1) for i in range(n_dev - 1)]
        from_below = jax.lax.ppermute(top_edge, axis_name, up)
        from_above = jax.lax.ppermute(bot_edge, axis_name, down)
        extended = jnp.concatenate([from_above, x_local, from_below], axis=1)
        out = fn(extended)
        out = out[:, overlap: overlap + stripe]
        return out

    sharded = shard_map(
        local, mesh=mesh,
        in_specs=P(None, axis_name, None, None),
        out_specs=P(None, axis_name, None, None),
        **relax_kwargs,
    )
    x = jax.device_put(x, NamedSharding(mesh, P(None, axis_name)))
    out = sharded(x)
    return jax.device_put(out, NamedSharding(mesh, P()))
