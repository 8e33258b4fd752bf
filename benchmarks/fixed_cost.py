"""Decompose the per-tile FIXED cost of the closest kernel on the TPU.

Round-3 finding (BASELINE.md): a live 128-ray tile pays ~3.35us before any
cluster visit — at 1M rays that is ~27 ms per trace pass, the binding floor
once visits are cheap.  This probe times the kernel on all-miss rays
(d = -d: zero visits, loop exits after init) under CUMULATIVE ablations
(trace_pallas.ABLATE) so successive deltas price each component:

    full     - noslab  = super broad phase (slab ALU + sup_score/cond)
    noslab   - noseed  = global-set seed (chunk dense test)
    noseed   - noviews = packed (8,R)->(R,8) transpose + 3 inv divides
    noviews  - body    = row reads + iotas + loop init machinery
    body               = residual (fori, mask lane-reduce, output writes)

Ablated kernels produce WRONG intersections by design; this is a timing
probe only.

    python benchmarks/fixed_cost.py [--size 1024] [--block 128]
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
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--block", type=int, default=128)
    args = ap.parse_args()

    from metal_raytracing_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from metal_raytracing_tpu import renderer as R
    from metal_raytracing_tpu.ops import trace_pallas
    from metal_raytracing_tpu.scenes import get_scene
    from metal_raytracing_tpu.types import RenderConfig
    from metal_raytracing_tpu.utils.profiling import sync

    size = args.size
    scene = get_scene(args.scene, size, size)
    cfg = RenderConfig(width=size, height=size, tracer="pallas",
                       ray_block=args.block)
    data, spec = scene.build(cluster_size=cfg.cluster_size,
                             builder=cfg.bvh_builder)
    px, py = R.pixel_coords(cfg)
    cam = data.camera
    uv_x = (px + 0.5) / size * 2.0 - 1.0
    uv_y = (py + 0.5) / size * 2.0 - 1.0
    d = (uv_x[:, None] * cam.right[None] + uv_y[:, None] * cam.up[None]
         + cam.forward[None])
    d = -(d / jnp.linalg.norm(d, axis=-1, keepdims=True))  # all-miss
    o = jnp.broadcast_to(cam.position[None], d.shape)
    mask = jnp.ones((d.shape[0],), bool)
    nb = d.shape[0] // args.block

    waterfall = [
        ("full", frozenset()),
        ("noslab", frozenset({"slab"})),
        ("noseed", frozenset({"slab", "seed"})),
        ("noviews", frozenset({"slab", "seed", "views"})),
        ("body", frozenset({"body"})),
    ]
    prev = None
    for name, ab in waterfall:
        trace_pallas.ABLATE = ab
        f = jax.jit(lambda o, d, m: trace_pallas.trace_closest(
            o, d, m, data.sup_planes, data.clu_planes, data.tri_planes,
            spec.bvh, block=args.block, exact_uv=False, flat=False).t)
        t0 = time.perf_counter()
        sync(f(o, d, mask))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = f(o, d, mask)
        sync(out)
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        us_blk = ms * 1e3 / nb
        print(json.dumps({
            "stage": name, "ms": round(ms, 3),
            "us_per_block": round(us_blk, 3),
            "delta_us": (None if prev is None
                         else round(prev - us_blk, 3)),
            "compile_s": round(compile_s, 1),
        }), flush=True)
        prev = us_blk
    trace_pallas.ABLATE = frozenset()
    return 0


if __name__ == "__main__":
    sys.exit(main())
