"""Streamed large-scene throughput: ~1M triangles via HBM-streamed
triangle planes (the VMEM-resident cap is ~200k; see
trace_pallas.VMEM_TRI_BUDGET_BYTES).

Round-1 measured 2.2 Mrays/s at 512² on this path before the round-2/3/4
traversal work (BASELINE.md "Scale"); this refreshes that number at the
current defaults.

    python benchmarks/big_scene.py [--size 512] [--samples 3] [--segments 700]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--segments", type=int, default=700)
    # rank-directed walk (RenderConfig.rank_trace): sorted-by-candidate
    # tiles make the streamed per-visit DMA schedule near-sequential —
    # the VERDICT r4 #7 lever for the streamed path
    ap.add_argument("--rank", type=int, default=0)
    args = ap.parse_args()

    from metal_raytracing_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np

    from metal_raytracing_tpu.io.procedural import (Material,
                                                    _model_from_parts,
                                                    _uv_sphere)
    from metal_raytracing_tpu.renderer import Renderer
    from metal_raytracing_tpu.scenes import plane_sphere_scene
    from metal_raytracing_tpu.types import RenderConfig

    # plane_sphere's camera/lights/floor with the 50x50 sphere swapped for
    # an N-segment one: ~2*N^2 triangles on the same silhouette.
    scene = plane_sphere_scene(args.size, args.size)
    pos, tris = _uv_sphere(args.segments, args.segments, 1.0)
    mat = Material(base_color=(0.8, 0.8, 0.8), specular_exponent=32.0,
                   name="None")
    big = _model_from_parts("bigsphere", [(mat, pos, tris)])
    idx = [i for i, it in enumerate(scene.instances)
           if it.model.name == "sphere"]
    assert idx, [i.model.name for i in scene.instances]
    inst = scene.instances[idx[0]]
    scene.instances[idx[0]] = type(inst)(model=big,
                                         transform=inst.transform)

    cfg = RenderConfig(width=args.size, height=args.size, max_bounces=3,
                       tracer="pallas", samples_per_dispatch=1,
                       rank_trace=args.rank,
                       # rank+pair composes via the 4-op variadic reduce,
                       # measured +13 ms on dragon (sweep_r5 batches 1-2)
                       pair_broadphase=(args.rank == 0))
    t0 = time.time()
    r = Renderer(scene, cfg)
    build_s = time.time() - t0
    from metal_raytracing_tpu.ops.trace_pallas import _should_stream

    streamed = bool(_should_stream(r.data.tri_planes))
    t0 = time.time()
    r.step(1)
    _ = float(np.asarray(r.image).sum())  # fence
    compile_s = time.time() - t0
    t0 = time.time()
    r.render(args.samples)
    dt = time.time() - t0
    rays = r.total_closest_rays + r.total_shadow_rays
    # subtract the warmup sample's rays from the per-sample average
    ms = dt / args.samples * 1e3
    mrays = rays / (args.samples + 1) / (dt / args.samples) / 1e6
    print(json.dumps({
        "triangles": int(r.spec.bvh.num_triangles),
        "clusters": int(r.spec.bvh.num_clusters),
        "streamed": streamed,
        "ms_per_sample": round(ms, 1),
        "mrays_per_s": round(mrays, 2),
        "build_s": round(build_s, 1),
        "compile_s": round(compile_s, 1),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
