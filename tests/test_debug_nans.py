"""NaN hygiene: the full wavefront pipeline under jax_debug_nans
(SURVEY.md §5 race-detection/sanitizer equivalent — JAX is functional, so
data races are impossible by construction; the remaining runtime hazard is
NaN generation in masked lanes, which this guards)."""

import jax
import numpy as np
import pytest

from metal_raytracing_tpu.renderer import Renderer
from metal_raytracing_tpu.scenes import coatball_scene, plane_sphere_scene
from metal_raytracing_tpu.types import RenderConfig


@pytest.mark.parametrize("tracer", ["bvh", "bruteforce"])
def test_pipeline_is_nan_free_under_debug_nans(tracer):
    cfg = RenderConfig(width=32, height=32, max_bounces=3, tracer=tracer,
                       ray_block=128)
    try:
        jax.config.update("jax_debug_nans", True)
        img = Renderer(plane_sphere_scene(32, 32), cfg).render(1)
    finally:
        jax.config.update("jax_debug_nans", False)
    assert np.isfinite(img).all()


def test_specular_pipeline_nan_free():
    cfg = RenderConfig(width=32, height=24, max_bounces=2, tracer="bvh",
                       ray_block=128, enable_specular=True,
                       enable_emission=True)
    try:
        jax.config.update("jax_debug_nans", True)
        img = Renderer(coatball_scene(32, 24), cfg).render(1)
    finally:
        jax.config.update("jax_debug_nans", False)
    assert np.isfinite(img).all()
