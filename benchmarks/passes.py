"""Per-pass cost breakdown on the TPU: where does a sample's time go?

Times (a) the traversal kernels standalone on primary rays, (b) the full
pipeline at max_bounces = 1..3 (differences give each bounce pass-pair's
cost including its compaction sort), (c) sort/no-sort/no-compaction
variants, and (d) a bare 16-operand lax.sort microbench.  Decision data
for the round-2 perf push (VERDICT.md next-step 2).

    python benchmarks/passes.py [--size 1024] [--scene dragon]
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
    ap.add_argument("--reps", type=int, default=3)
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
    cfg = RenderConfig(width=size, height=size, max_bounces=3,
                       tracer="pallas", ray_block=128)
    data, spec = scene.build(cluster_size=cfg.cluster_size,
                             builder=cfg.bvh_builder)
    offsets = R.make_pixel_offsets(cfg)

    def timed(name, fn, *a):
        fn(*a)  # compile
        sync(fn(*a))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*a)
        sync(out)
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        print(json.dumps({"pass": name, "ms": round(ms, 1)}), flush=True)
        return ms

    # --- primary rays, tile-major (same order the pipeline uses); offsets
    # itself stays row-major — render_sample does its own tile flattening
    px, py = R.pixel_coords(cfg)
    tiles = R.tile_shape(cfg)
    offs = offsets
    if tiles is not None:  # None: image does not divide into ray-block tiles
        th, tw = tiles
        px = R._tile_flatten(px.reshape(size, size), th, tw)
        py = R._tile_flatten(py.reshape(size, size), th, tw)
        offs = R._tile_flatten(offsets.reshape(size, size), th, tw)
    import metal_raytracing_tpu.sampling as sampling

    idx = offs.astype(jnp.int32)
    jx = sampling.halton(idx, sampling.DIM_PIXEL_X)
    jy = sampling.halton(idx, sampling.DIM_PIXEL_Y)
    uvx = (px + jx) / size * 2.0 - 1.0
    uvy = (py + jy) / size * 2.0 - 1.0
    cam = data.camera
    d = (uvx[:, None] * cam.right[None] + uvy[:, None] * cam.up[None]
         + cam.forward[None])
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(cam.position[None], d.shape)
    mask = jnp.ones((d.shape[0],), bool)

    closest = jax.jit(lambda o, d, m: trace_pallas.trace_closest(
        o, d, m, data.sup_planes, data.clu_planes, data.tri_planes,
        spec.bvh).t)
    timed("primary_closest_standalone", closest, o, d, mask)

    tmax = jnp.full((d.shape[0],), 100.0)
    anyf = jax.jit(lambda o, d, t, m: trace_pallas.trace_any(
        o, d, t, m, data.sup_planes, data.clu_planes, data.tri_planes,
        spec.bvh))
    timed("primary_any_standalone", anyf, o, d, tmax, mask)

    # --- layout probes: how much of the standalone closest cost is the
    # (N, 3) minor-dim slice (lane-padded layout) + the exact-uv epilogue
    # gather, vs the kernel itself?
    closest_nouv = jax.jit(lambda o, d, m: trace_pallas.trace_closest(
        o, d, m, data.sup_planes, data.clu_planes, data.tri_planes,
        spec.bvh, exact_uv=False).t)
    timed("primary_closest_nouv", closest_nouv, o, d, mask)
    # host-side cluster1 machinery at pipeline size: the fused broad
    # phase ((N, NC) slab argmin) and the global-seed key pass — paid
    # once per bounce sort + once per shadow sort when the key is active
    timed("nearest_cluster_1M",
          jax.jit(lambda o, d, m: trace_pallas.nearest_cluster(
              o, d, m, data.clu_planes, spec.bvh, return_key=True)[1]),
          o, d, mask)
    if spec.bvh.num_global:
        timed("global_seed_keys_1M",
              jax.jit(lambda o, d, m: trace_pallas.global_seed_keys(
                  o, d, m, data.tri_planes, spec.bvh)), o, d, mask)

    ocomp = tuple(jnp.ravel(o[:, i]) for i in range(3))
    dcomp = tuple(jnp.ravel(d[:, i]) for i in range(3))
    closest_pre = jax.jit(lambda ox, oy, oz, dx, dy, dz, m:
                          trace_pallas.trace_closest(
                              (ox, oy, oz), (dx, dy, dz), m,
                              data.sup_planes, data.clu_planes,
                              data.tri_planes, spec.bvh,
                              exact_uv=False).t)
    timed("primary_closest_prepacked", closest_pre, *ocomp, *dcomp, mask)

    # --- full pipeline at increasing depth
    def run(cfg_v):
        f = jax.jit(lambda dd, oo: R.render_sample(dd, spec, cfg_v, oo,
                                                   jnp.int32(0))[0])
        return lambda: f(data, offsets)

    prev = 0.0
    for b in (1, 2, 3):
        ms = timed(f"pipeline_b{b}",
                   run(dataclasses.replace(cfg, max_bounces=b)))
        if b > 1:
            print(json.dumps({"pass": f"bounce{b - 1}_pair_delta",
                              "ms": round(ms - prev, 1)}), flush=True)
        prev = ms

    timed("pipeline_b3_nosort",
          run(dataclasses.replace(cfg, sort_bounces=False)))
    timed("pipeline_b3_nocompact",
          run(dataclasses.replace(cfg, compaction=False)))

    # --- bare multi-operand sort at pipeline size
    n = size * size
    key = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, 1 << 30)
    ops = [jax.random.normal(jax.random.PRNGKey(i), (n,))
           for i in range(15)]
    sortf = jax.jit(lambda k, *xs: jax.lax.sort((k,) + xs, dimension=0,
                                                num_keys=1)[1])
    timed("sort16_1M", sortf, key, *ops)

    # --- shade-path micro-costs at pipeline size
    tri = jax.random.randint(jax.random.PRNGKey(2), (n,), 0,
                             data.shade_table.shape[0])
    timed("gather_shade_row_1M", jax.jit(lambda t: data.shade_table[t]), tri)

    def halton5(i):
        return sum(sampling.halton(i, sampling.bounce_dim(0, k))
                   for k in range(5))
    timed("halton_5dims_1M", jax.jit(halton5), idx)

    timed("pack_rays_1M",
          jax.jit(lambda o, d, m: trace_pallas._pack_rays(
              o, d, m, jnp.zeros((n,)), 128)[0]), o, d, mask)

    from metal_raytracing_tpu.lights import sample_lights, select_light

    def light_path(i, pos):
        lu = sampling.halton(i, sampling.bounce_dim(0, 0))
        li = select_light(lu, spec.light_count)
        r = jnp.stack([sampling.halton(i, sampling.bounce_dim(0, 1)),
                       sampling.halton(i, sampling.bounce_dim(0, 2))],
                      axis=-1)
        ls = sample_lights(data.lights, li, r, pos)
        return ls.direction + ls.color
    timed("light_sampling_1M", jax.jit(light_path), idx, o)

    def bounce_path(i, ns):
        r = jnp.stack([sampling.halton(i, sampling.bounce_dim(0, 3)),
                       sampling.halton(i, sampling.bounce_dim(0, 4))],
                      axis=-1)
        local = sampling.sample_cosine_weighted_hemisphere(r)
        return sampling.align_hemisphere_with_normal(local, ns)
    timed("bounce_dir_1M", jax.jit(bounce_path), idx, d)

    # --- whole pipeline with stub tracers: all non-traversal cost
    from metal_raytracing_tpu.ops.trace import Hit

    def stub_tracers(data_, spec_, cfg_):
        def closest(o, d, m, **kw):
            t = jnp.where(m, 1.0, 1e30)
            return Hit(t=t, u=jnp.full_like(t, 0.3),
                       v=jnp.full_like(t, 0.3),
                       tri=jnp.where(m, 0, -1))
        def any_hit(o, d, tm, m, **kw):
            return jnp.zeros(o.shape[:1], bool)
        return closest, any_hit, "stub"

    orig = R._make_tracers
    R._make_tracers = stub_tracers
    try:
        timed("pipeline_b3_stub_tracer", run(cfg))
        # In-pipeline sort costs (microbench sort timings overestimate —
        # XLA fuses the key computation and operand staging differently in
        # context).  Deltas against the stub pipeline isolate each sort.
        timed("pipeline_b3_stub_noshadowsort",
              run(dataclasses.replace(cfg, shadow_sort=False)))
        timed("pipeline_b3_stub_nocompact",
              run(dataclasses.replace(cfg, compaction=False)))
        # new round-3 sort knobs: their whole effect is non-traversal,
        # so the stub deltas ARE their pipeline savings
        timed("pipeline_b3_stub_packf16",
              run(dataclasses.replace(cfg, sort_pack_f16=True)))
        timed("pipeline_b3_stub_sortlast0",
              run(dataclasses.replace(cfg, sort_last_bounce=False)))
    finally:
        R._make_tracers = orig
    return 0


if __name__ == "__main__":
    sys.exit(main())
