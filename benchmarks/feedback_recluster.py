"""Feedback-driven re-cluster A/B (VERDICT r4 #8): rebuild the cluster
BVH to the MEASURED ray distribution and re-time in the same process.

Pass 1 renders one telemetry sample with RenderConfig.export_rays and
collects a strided sample of every bounce ray and shadow segment the
frame actually traces.  The scene is then rebuilt with the ``sah_rays``
builder (accel.sah_free_clusters(rays=...)), which scores each candidate
split by how many SAMPLE rays slab-hit the side boxes — the exact
quantity a cluster visit costs — instead of the surface-area proxy
(uniform-ray assumption).  Both builds are then timed back to back.

    python benchmarks/feedback_recluster.py [--size 1024] [--samples 4] \
        [--stride 64] [--scene dragon]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--samples", type=int, default=4)
    ap.add_argument("--stride", type=int, default=64)
    ap.add_argument("--save-rays", default="")
    args = ap.parse_args()

    from metal_raytracing_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from metal_raytracing_tpu import renderer as R
    from metal_raytracing_tpu.scenes import get_scene
    from metal_raytracing_tpu.types import RenderConfig
    from metal_raytracing_tpu.utils.metrics import visit_percentiles
    from metal_raytracing_tpu.utils.profiling import sync

    size = args.size
    base = RenderConfig(width=size, height=size, max_bounces=3,
                        tracer="pallas", samples_per_dispatch=1)
    scene = get_scene(args.scene, size, size)
    offsets = R.make_pixel_offsets(base)

    def time_build(name, data, spec):
        k = 1
        accum = jnp.zeros((size, size, 3))
        totals = jnp.zeros((2,))

        def step(d, o, fi, a, t):
            return R._progressive_step(d, o, fi, a, t, spec=spec, cfg=base,
                                       k=k)

        t0 = time.perf_counter()
        a, tt = step(data, offsets, jnp.int32(0), accum, totals)
        sync(a)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(args.samples):
            a, tt = step(data, offsets, jnp.int32(1 + i), a, tt)
        sync(a)
        ms = (time.perf_counter() - t0) / args.samples * 1e3
        line = {"variant": name, "ms_per_sample": round(ms, 1),
                "compile_s": round(compile_s, 1),
                "clusters": spec.bvh.num_clusters}
        try:
            tcfg = dataclasses.replace(base, telemetry=True)
            _, stats = jax.jit(
                lambda d, o: R.render_sample(d, spec, tcfg, o,
                                             jnp.int32(0)))(data, offsets)
            line.update(visit_percentiles(stats, pixels=size * size))
        except Exception as e:  # telemetry must never sink the A/B
            line["telemetry_error"] = str(e)[:120]
        print(json.dumps(line), flush=True)

    # ---- pass 1: baseline build (adopted defaults) + measured-ray export
    bkw = dict(cluster_size=base.cluster_size, builder=base.bvh_builder,
               presplit=base.bvh_presplit, builder_alpha=base.bvh_alpha)
    data, spec = scene.build(**bkw)
    ecfg = dataclasses.replace(base, export_rays=args.stride)
    t0 = time.perf_counter()
    _, stats = jax.jit(
        lambda d, o: R.render_sample(d, spec, ecfg, o, jnp.int32(0)))(
            data, offsets)
    rows = [np.asarray(v) for k, v in sorted(stats.items())
            if k.startswith(("rays_b", "srays_b"))]
    rays = np.concatenate(rows, axis=0)
    live = int((rays[:, 7] > 0).sum())
    print(json.dumps({"export_s": round(time.perf_counter() - t0, 1),
                      "sample_rays": int(rays.shape[0]),
                      "live_rays": live}), flush=True)
    if args.save_rays:
        np.savez_compressed(args.save_rays, rays=rays)

    time_build(base.bvh_builder, data, spec)

    # ---- pass 2: rebuild to the measured distribution, re-time
    t0 = time.perf_counter()
    data2, spec2 = scene.build(**{**bkw, "builder": "sah_rays"},
                               rays=rays)
    print(json.dumps({"rebuild_s": round(time.perf_counter() - t0, 1),
                      "clusters": spec2.bvh.num_clusters}), flush=True)
    time_build("sah_rays", data2, spec2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
