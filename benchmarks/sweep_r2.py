"""Round-2 traversal sweep on the TPU: BVH builder x leaf cluster size.

Measures full-pipeline ms/sample + Mrays/s on the dragon scene for each
(builder, cluster_size) combination, optionally with clusters-visited
telemetry.  Decision data for VERDICT.md round-1 next-step 2 (SAH builder,
finer leaves).

    python benchmarks/sweep_r2.py [--size 1024] [--samples 2] [--telemetry]
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
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--builders", default="median,sah")
    ap.add_argument("--clusters", default="384,256,128")
    ap.add_argument("--telemetry", action="store_true")
    ap.add_argument("--tracer", default="pallas")
    ap.add_argument("--ray-block", type=int, default=128)
    ap.add_argument("--sort-keys", default="dir_major")
    ap.add_argument("--shadow-sort", default="1",
                    help="comma list of 0/1 to A/B the shadow re-sort")
    ap.add_argument("--shadow-sort-primary", default="0",
                    help="comma list of 0/1: re-sort the primary shadow pass")
    args = ap.parse_args()

    from metal_raytracing_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from metal_raytracing_tpu.renderer import Renderer, render_sample
    from metal_raytracing_tpu.scenes import get_scene
    from metal_raytracing_tpu.types import RenderConfig
    from metal_raytracing_tpu.utils.metrics import benchmark_renderer

    import itertools

    for builder, csize, skey, ssort, sprim in itertools.product(
            args.builders.split(","),
            (int(c) for c in args.clusters.split(",")),
            args.sort_keys.split(","),
            (bool(int(v)) for v in args.shadow_sort.split(",")),
            (bool(int(v)) for v in args.shadow_sort_primary.split(","))):
            scene = get_scene(args.scene, args.size, args.size)
            cfg = RenderConfig(width=args.size, height=args.size,
                               max_bounces=3, tracer=args.tracer,
                               ray_block=args.ray_block, cluster_size=csize,
                               bvh_builder=builder, sort_key=skey,
                               shadow_sort=ssort, shadow_sort_primary=sprim)
            t0 = time.perf_counter()
            r = Renderer(scene, cfg)
            build_s = time.perf_counter() - t0
            res = benchmark_renderer(r, samples=args.samples, warmup=1)
            row = {
                "builder": builder,
                "cluster_size": csize,
                "ray_block": args.ray_block,
                "sort_key": skey,
                "shadow_sort": ssort,
                "shadow_sort_primary": sprim,
                "ms_per_sample": round(res.per_sample_seconds * 1e3, 1),
                "mrays_per_sec": round(res.mrays_per_sec, 3),
                "build_s": round(build_s, 2),
                "compile_s": round(res.compile_seconds, 1),
            }
            if args.telemetry:
                from metal_raytracing_tpu.utils.metrics import (
                    visit_percentiles)

                tcfg = dataclasses.replace(cfg, telemetry=True)
                _, stats = jax.jit(
                    lambda d, o: render_sample(d, r.spec, tcfg, o,
                                               jnp.int32(0)))(
                        r.data, r.offsets)
                row.update(visit_percentiles(stats))
            print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
