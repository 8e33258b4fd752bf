"""Golden image statistics: lock the render output so optimization rounds
cannot silently change the image (the CPU-reference pixel-parity gate of
SURVEY.md §4, in regression form).

Values recorded from the bvh tracer on the CPU backend, seed 0, 48x48,
1 sample, 3 bounces.  The bvh tracer is exactly equal to the brute-force
oracle and (to ~1e-4 RMSE) to the Pallas tracer, so locking it locks all
three.  Tolerances absorb cross-version float noise, not logic changes.
"""

import numpy as np
import pytest

from metal_raytracing_tpu.renderer import Renderer
from metal_raytracing_tpu.scenes import dragon_scene, plane_sphere_scene
from metal_raytracing_tpu.types import RenderConfig

GOLDEN = {
    # scene: (mean, max, nonzero_fraction)
    "plane_sphere": (0.07467572, 1.952569, 0.359809),
    "dragon": (0.13372391, 3.378546, 0.435764),
}


@pytest.mark.parametrize("scene_fn,name", [
    (plane_sphere_scene, "plane_sphere"),
    (dragon_scene, "dragon"),
])
def test_golden_image_statistics(scene_fn, name):
    cfg = RenderConfig(width=48, height=48, max_bounces=3, tracer="bvh",
                       ray_block=128, seed=0)
    img = Renderer(scene_fn(48, 48), cfg).render(1)
    mean, mx, nz = GOLDEN[name]
    assert img.mean() == pytest.approx(mean, rel=1e-4), name
    assert img.max() == pytest.approx(mx, rel=1e-4), name
    assert (img > 0).mean() == pytest.approx(nz, abs=1e-3), name
