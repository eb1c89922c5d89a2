"""GSEG_PLATFORM forces the jax platform at package-import time.

The deployment image preselects a TPU platform from a ``sitecustomize``
that runs before user code; the plain ``JAX_PLATFORMS=cpu`` env override
is ineffective there, and with the TPU tunnel unreachable every CLI hangs
at first device use.  ``glomeruli_segmentation_tpu.__init__`` therefore
honors ``GSEG_PLATFORM`` (+ ``GSEG_CPU_DEVICES``) with a config-level
switch.  Runs in a subprocess so the preselected platform (whatever it
is in this environment) is actually exercised.
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


def test_gseg_platform_forces_cpu_with_virtual_devices():
    env = dict(os.environ)
    env["GSEG_PLATFORM"] = "cpu"
    env["GSEG_CPU_DEVICES"] = "4"
    # a hung backend dial would block forever without the override; bound it
    r = subprocess.run([sys.executable, "-c", SCRIPT], env=env,
                       capture_output=True, text=True, timeout=240)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK 4" in r.stdout


def test_no_override_is_a_noop():
    # without GSEG_PLATFORM the hook must not touch jax config at all
    import glomeruli_segmentation_tpu as pkg

    os.environ.pop("GSEG_PLATFORM", None)
    pkg._apply_platform_override()  # must not raise or reset backends
