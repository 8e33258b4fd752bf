"""Generate the stored golden images (tests/golden/*.npz) from the
INDEPENDENT CPU oracle (reference_oracle.py — no package code in the
render path; the package supplies only scene DATA).

Run once when golden coverage changes:
    python tests/make_goldens.py

The goldens lock pixels, not summary statistics (VERDICT round 2 #7):
tests/test_golden.py gates the bvh AND pallas-interpret tracers on
per-pixel RMSE against these images, so any semantic drift in sampling,
shading, traversal, or compaction order fails loudly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))  # reference_oracle
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))  # repo root: metal_raytracing_tpu

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
SIZE = 64
BOUNCES = 3
SEED = 0
# (scene, extension-config overrides).  coatball locks the specular +
# emission extension shading, uv_test the texture path (VERDICT round 3
# #8: extension scenes previously relied on tracer-agreement only, which
# cannot catch a shared semantic regression in the extension code).
SCENES = (
    ("plane_sphere", {}),
    ("dragon", {}),
    ("coatball", {"enable_specular": True, "enable_emission": True}),
    ("uv_test", {"enable_textures": True}),
    ("teapot", {}),
    ("bunny_env", {"env_map": True}),
    ("glass_sphere", {"enable_refraction": True}),
)


def oracle_inputs(renderer):
    """Plain numpy scene data — the only thing the oracle shares."""
    import numpy as np

    from metal_raytracing_tpu.renderer import make_pixel_offsets

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


def oracle_extensions(renderer, scene):
    """Extension DATA for the oracle (material tables, per-corner
    texcoords in the renderer's triangle order, decoded texture images) —
    still data only, no render-path code."""
    import numpy as np

    from metal_raytracing_tpu.scene import flatten_instances

    cfg = renderer.cfg
    mats = renderer.data.materials
    ext = {"material_id": np.asarray(renderer.data.geometry.material_id)}
    if cfg.enable_emission:
        ext["emission"] = np.asarray(mats.emission)
    if cfg.enable_specular:
        ext["specular"] = np.asarray(mats.specular)
        ext["shininess"] = np.asarray(mats.specular_exponent)
    if cfg.env_map:
        ext["env_map"] = np.asarray(renderer.data.env_map)
    if cfg.enable_refraction:
        ext["refraction_index"] = np.asarray(mats.refraction_index)
        ext["dissolve"] = np.asarray(mats.dissolve)
    if cfg.enable_textures:
        from metal_raytracing_tpu.assets import load_texture

        # per-corner texcoords, re-permuted into the renderer's (Morton +
        # padded) triangle order via the stored source-index map
        *_, materials, uvc = flatten_instances(scene.instances)
        order = np.asarray(renderer.data.tri_src)
        uvc_p = np.zeros((order.shape[0], 3, 2), np.float64)
        valid = order >= 0
        uvc_p[valid] = uvc[order[valid]]
        ext["uvc"] = uvc_p
        ext["tex_images"] = [
            np.asarray(load_texture(m.texture)) if m.texture else None
            for m in materials]
    return ext


def main() -> int:
    # Force CPU before any backend init (the environment pre-registers a
    # TPU plugin; env vars alone are too late — CLAUDE.md).
    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from metal_raytracing_tpu.renderer import Renderer
    from metal_raytracing_tpu.scenes import get_scene
    from metal_raytracing_tpu.types import RenderConfig

    from reference_oracle import render_reference

    only = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, over in SCENES:
        if only is not None and name not in only:
            continue
        cfg = RenderConfig(width=SIZE, height=SIZE, max_bounces=BOUNCES,
                           tracer="bvh", ray_block=128, seed=SEED, **over)
        scene = get_scene(name, SIZE, SIZE)
        r = Renderer(scene, cfg)
        tris, lights, camera, offsets = oracle_inputs(r)
        ext = oracle_extensions(r, scene) if over else None
        img = render_reference(tris, lights, camera, SIZE, SIZE, offsets,
                               frame_index=0, bounces=BOUNCES, batch=16,
                               extensions=ext)
        path = os.path.join(GOLDEN_DIR, f"{name}_{SIZE}.npz")
        np.savez_compressed(path, image=np.asarray(img, np.float32),
                            size=SIZE, bounces=BOUNCES, seed=SEED)
        print(f"{path}: mean={img.mean():.6f} max={img.max():.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
