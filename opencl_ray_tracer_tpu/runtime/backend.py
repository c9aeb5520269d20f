"""Backend discovery & dispatch — the OpenCL host-runtime role, TPU-native.

The reference hand-rolls device discovery (enumerate platforms/devices,
prefer GPU, fall back to device 0 — states/MainState.cpp:1181-1271), runtime
kernel JIT with build-log dump (:1295-1316), and explicit buffer lifecycle
(:666-933). The JAX/XLA equivalents, which this module wraps:

  device discovery   -> jax.devices() / jax.local_devices()
  prefer-accelerator -> default backend prefers tpu > gpu > cpu
  runtime kernel JIT -> XLA trace+compile on first call (with an optional
                        HLO dump, the CL_PROGRAM_BUILD_LOG analogue)
  buffer write/map   -> jax.device_put / np.asarray(device_array)
  NDRange launch     -> the jitted/pallas_call renderer itself
"""

from __future__ import annotations

import enum
import os
from typing import List, Optional

import jax

from opencl_ray_tracer_tpu.utils.log import log_info, log_warning


class Backend(enum.Enum):
    """Renderer backends (the F1 mode toggle, MainState.h:48-52)."""

    REFERENCE = "reference"  # CPU oracle (jnp jitted on host CPU)
    XLA = "xla"              # whole-program XLA on the default device
    PALLAS = "pallas"        # fused Pallas megakernel (TPU; interpreted on CPU)


def describe_devices() -> List[str]:
    """Device capability dump, the analogue of MainState.cpp:1204-1260."""
    lines = []
    for d in jax.devices():
        lines.append(
            f"id={d.id} platform={d.platform} kind={getattr(d, 'device_kind', '?')}"
        )
    return lines


def log_devices() -> None:
    for line in describe_devices():
        log_info("device: %s", line)


def default_device() -> jax.Device:
    """Prefer accelerator, else device 0 — MainState.cpp:1242-1271 policy."""
    devs = jax.devices()
    for platform in ("tpu", "axon", "gpu"):
        for d in devs:
            if d.platform == platform:
                return d
    return devs[0]


def on_accelerator() -> bool:
    return default_device().platform != "cpu"


def available_backends() -> List[Backend]:
    return list(Backend)


def default_backend() -> Backend:
    """Pallas on real TPU; XLA elsewhere (Pallas still runs via interpret
    mode on CPU, but XLA is the faster CPU path)."""
    return Backend.PALLAS if on_accelerator() else Backend.XLA


def resolve_backend(name: Optional[str]) -> Backend:
    if name is None:
        return default_backend()
    if isinstance(name, Backend):
        return name
    return Backend(name)


def enable_hlo_dump(path: str = "/tmp/octrt_hlo") -> None:
    """The CL build-log analogue: dump XLA HLO for every compile."""
    os.makedirs(path, exist_ok=True)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_dump_to" not in flags:
        os.environ["XLA_FLAGS"] = f"{flags} --xla_dump_to={path}".strip()
        log_warning("HLO dump enabled at %s (set before first compile)", path)
