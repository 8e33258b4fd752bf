"""Pixel-parity gates against the INDEPENDENT CPU oracle.

``reference_oracle.render_reference`` shares no code with the package — only
scene DATA crosses the bridge below.  If any of the package's sampler
schedule, camera math, light formulas, barycentric weights, shadow logic, or
bounce math drifts from the reference semantics, these RMSE gates fail
(SURVEY.md §4 item 4; VERDICT.md round 1 missing #3)."""

import numpy as np
import pytest

from metal_raytracing_tpu.renderer import Renderer, make_pixel_offsets
from metal_raytracing_tpu.scenes import dragon_scene, plane_sphere_scene
from metal_raytracing_tpu.types import RenderConfig

from reference_oracle import render_reference


def _oracle_inputs(renderer: Renderer):
    """Extract plain numpy scene data (the only thing the oracle shares)."""
    g = renderer.data.geometry
    kd = np.asarray(renderer.data.materials.base_color)[
        np.asarray(g.material_id)]
    tris = {k: np.asarray(getattr(g, k))
            for k in ("v0", "e1", "e2", "n0", "n1", "n2")}
    tris["kd"] = kd
    lt = renderer.data.lights
    lights = [
        {"type": int(np.asarray(lt.type)[i]),
         "position": np.asarray(lt.position)[i],
         "color": np.asarray(lt.color)[i],
         "forward": np.asarray(lt.forward)[i],
         "right": np.asarray(lt.right)[i],
         "up": np.asarray(lt.up)[i],
         "cone_angle": float(np.asarray(lt.cone_angle)[i]),
         "direction": np.asarray(lt.direction)[i]}
        for i in range(lt.count)
    ]
    cam = renderer.data.camera
    camera = {k: np.asarray(getattr(cam, k))
              for k in ("position", "right", "up", "forward")}
    offsets = np.asarray(make_pixel_offsets(renderer.cfg))
    return tris, lights, camera, offsets


def _rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


@pytest.mark.parametrize("frame_index", [0, 1])
def test_plane_sphere_matches_oracle(frame_index):
    cfg = RenderConfig(width=48, height=48, max_bounces=3, tracer="bvh",
                       ray_block=128, seed=0)
    r = Renderer(plane_sphere_scene(48, 48), cfg)
    tris, lights, camera, offsets = _oracle_inputs(r)

    from metal_raytracing_tpu.renderer import render_sample
    import jax.numpy as jnp

    img, _ = render_sample(r.data, r.spec, cfg, jnp.asarray(offsets),
                           jnp.int32(frame_index))
    oracle = render_reference(tris, lights, camera, 48, 48, offsets,
                              frame_index=frame_index, bounces=3)
    err = _rmse(img, oracle)
    assert err < 1e-3, f"frame {frame_index}: RMSE {err:.2e} vs oracle"


def test_dragon_matches_oracle():
    cfg = RenderConfig(width=48, height=48, max_bounces=3, tracer="bvh",
                       ray_block=128, seed=0)
    r = Renderer(dragon_scene(48, 48), cfg)
    tris, lights, camera, offsets = _oracle_inputs(r)
    img = r.render(1)
    oracle = render_reference(tris, lights, camera, 48, 48, offsets,
                              frame_index=0, bounces=3, batch=16)
    err = _rmse(img, oracle)
    assert err < 1e-3, f"dragon: RMSE {err:.2e} vs oracle"


def test_oracle_is_self_consistent():
    """Sanity: the oracle produces a lit, finite image on its own."""
    cfg = RenderConfig(width=16, height=16, max_bounces=2, tracer="bvh",
                       ray_block=64, seed=0)
    r = Renderer(plane_sphere_scene(16, 16), cfg)
    tris, lights, camera, offsets = _oracle_inputs(r)
    img = render_reference(tris, lights, camera, 16, 16, offsets, bounces=2)
    assert np.isfinite(img).all()
    assert img.max() > 0.01
