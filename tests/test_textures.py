"""UV/texture extension tests: affine UV rows, loaders, shading parity.

The reference parses texcoords and ships texture assets (uv_test/,
coatball/tex_*.png) but never shades them (SURVEY.md §2d); texturing here
is a config-gated extension (RenderConfig.enable_textures).
"""

import dataclasses

import numpy as np
import pytest

from metal_raytracing_tpu.assets import load_texture
from metal_raytracing_tpu.io import procedural
from metal_raytracing_tpu.io.image import rmse
from metal_raytracing_tpu.renderer import Renderer
from metal_raytracing_tpu.scene import Scene, build_scene_data
from metal_raytracing_tpu.scenes import get_scene, uv_test_scene
from metal_raytracing_tpu.types import RenderConfig, area_light


def _textured_cfg(**kw):
    base = dict(width=48, height=48, max_bounces=2, tracer="bvh",
                ray_block=128, enable_textures=True)
    base.update(kw)
    return RenderConfig(**base)


def _proc_scene(w=48, h=48):
    """uv_test built strictly from the procedural checkerboard quad."""
    s = Scene(w, h, default_lights=False)
    s.name = "uv_proc"
    s.lights = [area_light(position=(0.0, 2.0, 3.0),
                           forward=(0.0, -0.3, -1.0),
                           right=(0.8, 0.0, 0.0), up=(0.0, 0.8, 0.0),
                           color=(10.0, 10.0, 10.0))]
    s.add_instance(procedural.make_model("uv_test"),
                   position=(0.0, 0.0, 0.0))
    return s


def test_checker_texture_decodes():
    t = load_texture("checker:4")
    assert t.shape == (64, 64, 3)
    assert 0.0 <= t.min() and t.max() <= 1.0
    # adjacent cells differ (it IS a checkerboard)
    assert abs(float(t[0, 0, 0]) - float(t[0, 8, 0])) > 0.1


def test_uv_affine_rows_match_barycentric_interpolation():
    """uv(p) = A p + b from _pack_uv_table must equal the direct
    barycentric interpolation (1-u-v) uv0 + u uv1 + v uv2 for points on
    the triangle plane."""
    import jax

    from metal_raytracing_tpu.scene import _pack_uv_table
    from metal_raytracing_tpu.ops.trace_pallas import pack_triangle_planes

    rng = np.random.RandomState(7)
    n = 64
    v0 = rng.randn(n, 3).astype(np.float32)
    e1 = rng.randn(n, 3).astype(np.float32)
    e2 = rng.randn(n, 3).astype(np.float32)
    uvc = rng.rand(n, 3, 2).astype(np.float32)

    class G:  # minimal geometry carrier for pack_triangle_planes
        pass

    g = G()
    g.v0, g.e1, g.e2 = v0, e1, e2
    tri = pack_triangle_planes(g)
    rows = np.asarray(_pack_uv_table(uvc, tri))

    u = rng.rand(n, 1).astype(np.float32) * 0.5
    v = rng.rand(n, 1).astype(np.float32) * 0.5
    p = v0 + u * e1 + v * e2
    expect = (1.0 - u - v) * uvc[:, 0] + u * uvc[:, 1] + v * uvc[:, 2]
    got_u = (rows[:, 0] * p[:, 0] + rows[:, 2] * p[:, 1]
             + rows[:, 4] * p[:, 2] + rows[:, 6])
    got_v = (rows[:, 1] * p[:, 0] + rows[:, 3] * p[:, 1]
             + rows[:, 5] * p[:, 2] + rows[:, 7])
    np.testing.assert_allclose(got_u, expect[:, 0], atol=2e-4)
    np.testing.assert_allclose(got_v, expect[:, 1], atol=2e-4)


def test_textured_scene_builds_tables():
    s = _proc_scene()
    data, spec = s.build(cluster_size=128)
    assert spec.has_textures
    assert data.uv_table is not None and data.uv_table.shape[1] == 8
    assert data.tex_stack is not None and data.tex_stack.shape[0] >= 1
    assert data.tex_hw is not None


def test_untextured_scene_has_no_tables():
    data, spec = get_scene("plane_sphere", 32, 32).build(cluster_size=128)
    assert not spec.has_textures
    assert data.uv_table is None and data.tex_stack is None


def test_texture_modulation_changes_image_and_tracers_agree():
    on = Renderer(_proc_scene(), _textured_cfg()).render(2)
    off = Renderer(_proc_scene(),
                   _textured_cfg(enable_textures=False)).render(2)
    assert rmse(on, off) > 1e-3  # the checkerboard actually shades
    brute = Renderer(_proc_scene(),
                     _textured_cfg(tracer="bruteforce")).render(2)
    assert rmse(on, brute) == 0.0  # texture shading is tracer-independent


def test_uv_test_scene_renders():
    cfg = _textured_cfg()
    img = Renderer(uv_test_scene(48, 48), cfg).render(1)
    assert img.shape == (48, 48, 3)
    assert float(img.max()) > 0.0


def test_mtl_map_kd_parsed(tmp_path):
    from metal_raytracing_tpu.io.obj import load_mtl

    mtl = tmp_path / "m.mtl"
    mtl.write_text("newmtl tex\nKd 1 1 1\nmap_Kd tex_file.png\n")
    mats = load_mtl(str(mtl))
    assert mats["tex"].texture == str(tmp_path / "tex_file.png")


def test_textured_pallas_parity_on_clean_geometry():
    """Pallas (interpret) vs bvh with textures on, on the procedural quad.

    (The file-loaded uv_test building also passes the < 1e-3 bar now that
    the shade pass recomputes the exact hit distance — see
    test_trace_pallas.py::test_pallas_uv_test_parity.)
    """
    on_bvh = Renderer(_proc_scene(), _textured_cfg(
        cluster_size=128)).render(2)
    on_pal = Renderer(_proc_scene(), _textured_cfg(
        tracer="pallas", cluster_size=128)).render(2)
    assert rmse(on_bvh, on_pal) < 1e-3


def test_bilinear_filter_smooths_and_agrees_at_centers():
    """cfg.texture_filter="bilinear": 4-tap lerp (the reference ships a
    mipmapped texture asset it never samples; filtering is our deliberate
    extension past nearest).  Bilinear must (a) change the image vs
    nearest on a checkerboard, (b) stay within the scene's dynamic range,
    and (c) remain tracer-independent."""
    near = Renderer(_proc_scene(), _textured_cfg()).render(2)
    bil = Renderer(_proc_scene(), _textured_cfg(
        texture_filter="bilinear")).render(2)
    assert rmse(near, bil) > 1e-4  # filtering actually changes texels
    assert bil.min() >= 0.0 and bil.max() <= near.max() + 1e-4
    brute = Renderer(_proc_scene(), _textured_cfg(
        texture_filter="bilinear", tracer="bruteforce")).render(2)
    assert rmse(bil, brute) == 0.0
