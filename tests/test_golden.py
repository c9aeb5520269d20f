"""Golden-image regression tests.

The reference sketched this and never wired it up (encodePNG call commented
out, MainState.cpp:971; SURVEY.md §4.3). Here it is real: tiny golden PNGs
committed under tests/golden/, regenerated with
`python tests/test_golden.py regen` (writes from the CPU oracle)."""

import os
import sys

import numpy as np
import pytest

from opencl_ray_tracer_tpu import RenderConfig, create_scene, legacy_ortho_camera
from opencl_ray_tracer_tpu.ref import render_reference
from opencl_ray_tracer_tpu.utils import pack_rgba, read_png, write_png

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
W, H = 160, 120

CASES = [
    ("scene1_legacy", 1, "legacy", False),
    ("scene2_legacy", 2, "legacy", False),
    ("scene1_phong", 1, "phong", True),
]


def render_case(scene_num, shading, shadows):
    cfg = RenderConfig(
        width=W,
        height=H,
        shading=shading,
        shadows=shadows,
        framebuffer_dtype="int" if shading == "legacy" else "float",
    )
    fb = render_reference(
        create_scene(scene_num, seed=0), legacy_ortho_camera(), cfg
    )
    return pack_rgba(fb)


@pytest.mark.parametrize("name,scene_num,shading,shadows", CASES)
def test_golden(name, scene_num, shading, shadows):
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    assert os.path.exists(path), (
        f"golden {path} missing — run `python tests/test_golden.py regen`"
    )
    want = read_png(path)
    got = render_case(scene_num, shading, shadows)
    same = np.all(got == want, axis=-1).mean()
    # byte-exact except for a tolerance on future fp changes at edges
    assert same > 0.999, f"{name}: only {same:.4%} identical to golden"


def regen():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, scene_num, shading, shadows in CASES:
        img = render_case(scene_num, shading, shadows)
        write_png(os.path.join(GOLDEN_DIR, f"{name}.png"), img.astype(np.int32))
        print("wrote", name)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        import jax

        jax.config.update("jax_platforms", "cpu")
        regen()
