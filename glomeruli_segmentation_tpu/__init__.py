"""TPU-native glomerular detection & segmentation framework.

A ground-up JAX/XLA/Pallas re-design of the renal-pathology pipeline
described by jinseikenai/glomeruli_segmentation (see SURVEY.md at repo
root): NDPI whole-slide ingest -> sliding-window glomerulus detection ->
cross-window box merging -> level-0 crops -> ESPNet multi-class
segmentation -> labelme-style polygon export -> WSI stitching and
confusion-matrix evaluation, plus a SegFormer (GTCS) variant.

Layout
------
- :mod:`.models`   ESPNet / Faster R-CNN / SegFormer in Flax (NHWC, bf16-ready)
- :mod:`.ops`      device ops: cv2-parity resize, preprocessing, NMS, ROI-align
- :mod:`.parallel` mesh construction and sharded batch execution helpers
- :mod:`.convert`  torch-free legacy ``.pth`` reader and weight importers
- :mod:`.wsi`      NDPI/BigTIFF readers (C++ fast path + pure-python fallback)
- :mod:`.eval`     confusion-matrix metrics (IoU/Dice), boundary extraction
- :mod:`.data`     dataset statistics, multi-scale augmentation, loaders
- :mod:`.train`    training loops (optax), checkpointing
- :mod:`.pipeline` the five WSI pipeline stages
- :mod:`.cli`      argparse entry points mirroring the reference's public CLIs
"""

__version__ = "0.1.0"


def _apply_platform_override() -> None:
    """Honor ``GSEG_PLATFORM`` (e.g. ``cpu``) at the jax *config* level.

    Some deployments preselect a TPU platform from a ``sitecustomize``
    that runs before user code, where the documented
    ``JAX_PLATFORMS=cpu`` env override is silently ineffective — and with
    the TPU tunnel unreachable every CLI would hang at first device use.
    ``GSEG_PLATFORM=cpu`` forces the platform the way tests/conftest.py
    does (config update + backend reset), which works regardless of what
    the interpreter start-up preselected.  ``GSEG_CPU_DEVICES=N``
    additionally requests N virtual CPU devices (for mesh runs off-TPU).
    No-op when the variable is unset."""
    import os

    platform = os.environ.get("GSEG_PLATFORM")
    if not platform:
        return
    import jax

    jax.config.update("jax_platforms", platform)
    try:
        import jax.extend.backend as _jeb

        _jeb.clear_backends()
    except (ImportError, AttributeError):
        pass  # older jax without the reset API; nothing initialized yet
    n = os.environ.get("GSEG_CPU_DEVICES")
    if platform == "cpu" and n:
        try:
            count = int(n)
        except ValueError:
            raise ValueError(
                f"GSEG_CPU_DEVICES must be an integer, got {n!r}") from None
        jax.config.update("jax_num_cpu_devices", count)


def _configure_compilation_cache() -> None:
    """Point JAX at a persistent compilation cache unless the user already
    did.  TPU programs here compile through a remote AOT service where the
    big pipeline programs take minutes; without an on-disk cache every CLI
    process would pay that cost again.  Respects
    ``JAX_COMPILATION_CACHE_DIR`` and an explicitly-set config value;
    opt out with ``GSEG_NO_COMPILE_CACHE=1``."""
    import os

    if os.environ.get("GSEG_NO_COMPILE_CACHE"):
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return  # jax reads this itself
    try:
        import jax

        if jax.config.jax_compilation_cache_dir:
            return
        cache = os.path.join(
            os.environ.get("XDG_CACHE_HOME",
                           os.path.expanduser("~/.cache")),
            "glomeruli_segmentation_tpu", "jax")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
    except Exception:  # never block import on cache setup
        pass


_apply_platform_override()
_configure_compilation_cache()
