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
SCENES = ("plane_sphere", "dragon")


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

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name in SCENES:
        cfg = RenderConfig(width=SIZE, height=SIZE, max_bounces=BOUNCES,
                           tracer="bvh", ray_block=128, seed=SEED)
        r = Renderer(get_scene(name, SIZE, SIZE), cfg)
        tris, lights, camera, offsets = oracle_inputs(r)
        img = render_reference(tris, lights, camera, SIZE, SIZE, offsets,
                               frame_index=0, bounces=BOUNCES, batch=16)
        path = os.path.join(GOLDEN_DIR, f"{name}_{SIZE}.npz")
        np.savez_compressed(path, image=np.asarray(img, np.float32),
                            size=SIZE, bounces=BOUNCES, seed=SEED)
        print(f"{path}: mean={img.mean():.6f} max={img.max():.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
