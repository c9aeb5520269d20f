"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the "fake backend" strategy from SURVEY.md §4: sharding code paths
exercise a real Mesh without TPU hardware, and Pallas kernels run in
interpret mode (selected inside the kernels when the platform is CPU).

Opt-in REAL-TPU mode (VERDICT round-1 item 7): `RUN_TPU=1 python -m pytest
tests/test_pallas_fwd.py tests/test_pallas_tiled.py tests/test_pallas_pinhole.py
tests/test_pallas_soft.py tests/test_soft_tiled.py tests/test_packed_fb.py
-q` leaves the session's
TPU backend in place so the Pallas kernels run COMPILED (Mosaic), making the
Mosaic-vs-interpret parity check automated and repeatable — including the
soft kernels' gradient parity (round-3 green run documented in
docs/PERF.md). Tests that need
the 8-device mesh are skipped automatically when fewer devices exist. First
compiles go through the remote-compile tunnel (~15-600s per new kernel
config; cached afterwards) — select files rather than running the whole
suite.
"""

import os

RUN_TPU = os.environ.get("RUN_TPU") == "1"

if not RUN_TPU:
    # The session environment pins JAX_PLATFORMS=axon (the tunneled TPU) and
    # the interpreter's sitecustomize imports jax at startup, so env vars
    # alone are too late. jax.config.update works until the backend is first
    # used, and XLA_FLAGS is read at backend-init time, so both overrides
    # below still land.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not RUN_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if not RUN_TPU:
        return
    if len(jax.devices()) >= 8:
        return
    skip_mesh = pytest.mark.skip(
        reason="needs the 8-device virtual mesh (run without RUN_TPU)"
    )
    for item in items:
        needs_mesh = "eight_devices" in getattr(item, "fixturenames", ())
        mod = getattr(item, "module", None)
        name = getattr(mod, "__name__", "")
        if needs_mesh or name in ("test_parallel", "test_distributed"):
            item.add_marker(skip_mesh)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


@pytest.fixture(scope="session")
def scene1():
    from opencl_ray_tracer_tpu import create_scene1

    return create_scene1()


@pytest.fixture(scope="session")
def scene2():
    from opencl_ray_tracer_tpu import create_scene2

    return create_scene2(seed=7)


@pytest.fixture(scope="session")
def scene3_small():
    """Scene-3-style stress scene at reduced count for CI speed."""
    from opencl_ray_tracer_tpu import random_scene

    return random_scene(20, 20, seed=3)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
