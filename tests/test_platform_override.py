"""GSEG_PLATFORM forces the jax platform at package-import time.

The deployment image preselects a TPU platform from a ``sitecustomize``
that runs before user code, where the plain ``JAX_PLATFORMS=cpu`` env
override is ineffective and — with the TPU tunnel unreachable — every
CLI hangs at first device use.  ``glomeruli_segmentation_tpu.__init__``
therefore honors ``GSEG_PLATFORM`` (+ ``GSEG_CPU_DEVICES``) with a
config-level switch.  Runs in a subprocess with the TPU platform
explicitly preselected via env, so the override (config update beats the
env-var default) is what the assertion actually exercises.
"""
import os
import subprocess
import sys

SCRIPT = """
import jax
import glomeruli_segmentation_tpu  # applies the override on import
devs = jax.devices()
assert devs[0].platform == "cpu", devs
assert len(devs) == 4, devs
print("OK", len(devs))
"""


def _child_env(**extra):
    env = dict(os.environ)
    # conftest forces JAX_PLATFORMS=cpu for the suite; restore the
    # preselected-TPU scenario the override exists for (config-level
    # update must beat the env-var platform default)
    env["JAX_PLATFORMS"] = "axon"
    env.update(extra)
    return env


def test_gseg_platform_forces_cpu_with_virtual_devices():
    env = _child_env(GSEG_PLATFORM="cpu", GSEG_CPU_DEVICES="4")
    # a hung backend dial would block forever without the override; bound it
    r = subprocess.run([sys.executable, "-c", SCRIPT], env=env,
                       capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK 4" in r.stdout


def test_malformed_device_count_fails_with_clear_message():
    env = _child_env(GSEG_PLATFORM="cpu", GSEG_CPU_DEVICES="eight")
    r = subprocess.run(
        [sys.executable, "-c", "import glomeruli_segmentation_tpu"],
        env=env, capture_output=True, text=True, timeout=240)
    assert r.returncode != 0
    assert "GSEG_CPU_DEVICES must be an integer" in r.stderr


def test_no_override_is_a_noop(monkeypatch):
    # without GSEG_PLATFORM the hook must not touch jax config at all
    import jax

    import glomeruli_segmentation_tpu as pkg

    monkeypatch.delenv("GSEG_PLATFORM", raising=False)
    before = jax.config.jax_platforms
    pkg._apply_platform_override()
    assert jax.config.jax_platforms == before
