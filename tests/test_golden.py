"""Pixel-level golden images: lock the render output so optimization
rounds cannot silently change the image (SURVEY.md §4 item 4, in
regression form; VERDICT round 2 #7 upgraded this from 3 summary
statistics to stored per-pixel images).

The goldens in tests/golden/ are rendered by the INDEPENDENT CPU oracle
(tests/make_goldens.py -> reference_oracle.render_reference, which shares
no code with the package), 64x64, seed 0, 1 sample, 3 bounces.  Both the
bvh tracer AND the Pallas tracer (interpret mode on CPU) are gated here,
so a semantic change in sampling, shading, traversal, or compaction order
fails this test on the exact tracer AND the perf tracer.
"""

import os

import numpy as np
import pytest

from metal_raytracing_tpu.renderer import Renderer
from metal_raytracing_tpu.scenes import get_scene
from metal_raytracing_tpu.types import RenderConfig

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
SIZE = 64


def _golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}_{SIZE}.npz")
    with np.load(path) as f:
        return f["image"], int(f["bounces"]), int(f["seed"])


# Extension-scene goldens set the matching RenderConfig flags (the golden
# images bake them in — see make_goldens.SCENES); a one-line change in the
# specular/emission/texture shading now fails a pixel test instead of
# hiding behind tracer agreement (VERDICT round 3 #8).
_FLAGS = {
    "coatball": {"enable_specular": True, "enable_emission": True},
    "uv_test": {"enable_textures": True},
    "bunny_env": {"env_map": True},
    "glass_sphere": {"enable_refraction": True},
}


@pytest.mark.parametrize("name,tracer", [
    ("plane_sphere", "bvh"),
    ("plane_sphere", "pallas"),
    ("dragon", "bvh"),
    ("dragon", "pallas"),
    ("coatball", "bvh"),
    ("coatball", "pallas"),
    ("uv_test", "bvh"),
    ("uv_test", "pallas"),
    ("teapot", "bvh"),
    ("teapot", "pallas"),
    ("bunny_env", "bvh"),
    ("bunny_env", "pallas"),
    ("glass_sphere", "bvh"),
    ("glass_sphere", "pallas"),
])
def test_golden_image_pixels(name, tracer):
    golden, bounces, seed = _golden(name)
    cfg = RenderConfig(width=SIZE, height=SIZE, max_bounces=bounces,
                       tracer=tracer, ray_block=128, seed=seed,
                       **_FLAGS.get(name, {}))
    img = Renderer(get_scene(name, SIZE, SIZE), cfg).render(1)
    diff = np.asarray(img, np.float64) - np.asarray(golden, np.float64)
    rmse = float(np.sqrt(np.mean(diff ** 2)))
    # The oracle shares the exact sampler schedule, so the residual is
    # pure float noise (f32 vs f64 shading); a one-line semantic change
    # moves whole pixel populations and trips both gates.
    assert rmse < 1e-3, f"{name}/{tracer}: RMSE {rmse:.2e} vs stored oracle"
    assert float(np.abs(diff).max()) < 5e-2, (
        f"{name}/{tracer}: max pixel diff {np.abs(diff).max():.2e}")
