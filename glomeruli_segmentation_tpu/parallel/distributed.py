"""Multi-process (multi-host / DCN) execution support.

The reference is strictly single-device — ``--gpu_id`` selects one GPU
(``module/espnet/train/main.py:470``) and no distributed backend of any
kind exists (SURVEY.md §2.11).  The single-host mesh path
(:mod:`.mesh`, ``--data_parallel``) shards batches over ICI within one
process; this module extends the *same* data-parallel layout across
processes — e.g. multiple TPU hosts connected over DCN — via JAX's
distributed runtime.  Every process runs the same SPMD program:

- :func:`init_distributed` connects the processes (coordination
  service), after which ``jax.devices()`` is the **global** device set
  and :func:`..parallel.mesh.make_mesh` builds a process-spanning mesh.
- The jit'd train/eval steps need **no changes**: ``in_shardings
  P("data")`` is already the global layout, and the GSPMD partitioner
  inserts the cross-host collectives (gradient psum rides DCN).
- Only array *construction* differs: a process can address only its
  local devices, so global batches are assembled with
  :func:`put_global` (``jax.make_array_from_callback`` — each process
  materializes exactly the shards it hosts, nothing is gathered).
- Replicated step *outputs* (loss, metric histograms — the in-jit
  confusion matrix of :func:`..eval.iou_eval.confusion_matrix`) are
  fully addressable on every process, so the host-side training loop
  reads them exactly as in the single-process case.

Input pipeline: every process computes identical batches (same files,
same seed, same augmentation draws) and :func:`put_global` slices out
the rows its devices own.  Batches are therefore bit-identical to the
single-process run; final weights agree to gradient-all-reduce
reduction-order noise (~1e-6 observed — gloo's cross-process algorithm
orders the sum differently than the in-process psum), asserted in
``tests/test_distributed.py``.  The cost is duplicated host-side PNG
decode, which is noise for this workload (~25 images/batch); a sharded
loader would trade that parity for IO scaling.

Artifact writes (checkpoints, logs — the reference's public contract)
happen on process 0 only (:func:`is_primary`), with :func:`barrier`
ordering the shared-filesystem handoffs (e.g. the dataset-stats pickle
cache).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


_initialized = False


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize JAX's distributed runtime (idempotent, env-driven).

    Arguments fall back to ``GSEG_COORDINATOR`` / ``GSEG_NUM_PROCESSES``
    / ``GSEG_PROCESS_ID``.  Returns True when the runtime spans more
    than one process.  A no-op single-process setup (no coordinator
    anywhere) returns False **without touching jax**: querying
    ``jax.process_count()`` here would instantiate the backend, and
    ``jax.distributed.initialize`` must run before any backend exists
    (a pre-created client silently stays single-process — observed on
    this host's sitecustomize-preinitialized setup).  For the same
    reason the idempotency guard is a module flag, not a device query.
    """
    global _initialized
    coordinator = coordinator or os.environ.get("GSEG_COORDINATOR")
    if num_processes is None and os.environ.get("GSEG_NUM_PROCESSES"):
        num_processes = int(os.environ["GSEG_NUM_PROCESSES"])
    if process_id is None and os.environ.get("GSEG_PROCESS_ID"):
        process_id = int(os.environ["GSEG_PROCESS_ID"])
    if coordinator is None and num_processes is None:
        return _initialized and jax.process_count() > 1
    if not _initialized:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        _initialized = True
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that owns artifact writes (process 0).

    jax-free when the distributed runtime was never initialized, so
    single-process code paths (CLI train without --coordinator) don't
    instantiate the backend earlier than they otherwise would.
    """
    return (not _initialized) or jax.process_index() == 0


def barrier(name: str, timeout_s: int = 3600) -> None:
    """Block until every process reaches this point (no-op single-process).

    Used to order shared-filesystem handoffs (process 0 writes the
    dataset-stats cache, everyone else reads it after the barrier) and to
    align processes before their first collective.  Goes through the
    coordination service (``wait_at_barrier``), NOT a device collective
    (``multihost_utils.sync_global_devices`` psums over devices): the
    device path would itself initialize a gloo/ICI communicator under a
    hardcoded ~30s peer timeout — exactly the race this barrier exists
    to prevent when peers are minutes apart (e.g. serialized first-time
    compiles on a shared host, or rank 0 scanning the dataset).
    """
    if _initialized and jax.process_count() > 1:
        from jax._src import distributed as _dist

        _dist.global_state.client.wait_at_barrier(name, timeout_s * 1000)


def compile_aligned(jitted, name: str):
    """Wrap a jitted step: AOT-compile, then barrier, then execute.

    Multi-process collectives (gloo over DCN, here standing in for the
    real thing) initialize their communicator at first execution with a
    short (~30s) peer-connect timeout, while first-time XLA compiles
    take minutes and are NOT synchronized across processes — on a
    shared/slow host one rank reaches the collective while another is
    still compiling, and the run dies with "Gloo context initialization
    failed: DEADLINE_EXCEEDED".  Compiling ahead-of-time (same shapes as
    the first call) and meeting at a coordination-service barrier puts
    every process at the collective within milliseconds.  Single-process
    returns the step unchanged.

    Compiles are cached per argument-shape signature (jit semantics);
    every process sees the same batch stream, so cache misses — and
    therefore the numbered barriers — occur in the same order everywhere.
    """
    if jax.process_count() <= 1:
        return jitted
    cache = {}

    def call(*args):
        key = tuple(
            (tuple(leaf.shape), str(leaf.dtype)) if hasattr(leaf, "shape")
            else repr(leaf) for leaf in jax.tree.leaves(args))
        compiled = cache.get(key)
        if compiled is None:
            compiled = jitted.lower(*args).compile()
            barrier(f"gseg_compile:{name}:{len(cache)}")
            cache[key] = compiled
        return compiled(*args)

    return call


def put_global(sharding, batch: np.ndarray):
    """Assemble a global device array from a host batch every process holds.

    Single-process this is exactly ``jax.device_put``.  Multi-process,
    ``jax.device_put`` of host data onto a process-spanning sharding is
    not possible (a process cannot address other hosts' devices);
    ``make_array_from_callback`` instead materializes, per process, only
    the shards its local devices own — the callback receives the global
    index of each shard and slices it from the (identical) host batch.
    """
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.make_array_from_callback(batch.shape, sharding,
                                        lambda idx: batch[idx])


def host_replicated(tree):
    """Make a pytree acceptable as a replicated jit input in every mode.

    Multi-process jit inputs must be either global arrays or host
    (numpy) values — single-device committed arrays (e.g. fresh
    ``model.init`` output) are rejected.  Numpy conversion is the
    portable form; jit's ``in_shardings=P()`` replicates it onto the
    global mesh (all processes hold identical values by construction —
    same seed, same init).
    """
    return jax.tree.map(np.asarray, tree)
