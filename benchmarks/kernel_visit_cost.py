"""Decompose the Pallas traversal kernel's per-visit cost on the TPU.

Times trace_closest standalone on the dragon primaries for cluster sizes
{384, 128} and reads the matching clusters-visited telemetry; with
  time_per_block = fixed + visits * (machinery + chunks * dense)
two observations give (fixed + visits*machinery) vs the dense share —
i.e., whether the extract-min machinery or the dense Baldwin-Weber test
dominates, which picks the next kernel lever.

    python benchmarks/kernel_visit_cost.py [--size 1024]
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
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--clusters", default="384,128")
    ap.add_argument("--rays", default="primary",
                    choices=("primary", "bounce"),
                    help="bounce: cosine-sampled rays from the primary hit "
                         "points, dir6-sorted like the pipeline — the "
                         "incoherent workload that dominates a sample")
    args = ap.parse_args()

    from metal_raytracing_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from metal_raytracing_tpu import renderer as R
    from metal_raytracing_tpu.ops import trace_pallas
    from metal_raytracing_tpu.scenes import get_scene
    from metal_raytracing_tpu.types import RenderConfig
    from metal_raytracing_tpu.utils.profiling import sync

    size = args.size
    for csize in (int(c) for c in args.clusters.split(",")):
        scene = get_scene(args.scene, size, size)
        cfg = RenderConfig(width=size, height=size, tracer="pallas",
                           ray_block=128, cluster_size=csize)
        data, spec = scene.build(cluster_size=csize, builder=cfg.bvh_builder)
        px, py = R.pixel_coords(cfg)
        tiles = R.tile_shape(cfg)
        if tiles is not None:
            th, tw = tiles
            px = R._tile_flatten(px.reshape(size, size), th, tw)
            py = R._tile_flatten(py.reshape(size, size), th, tw)
        cam = data.camera
        uv_x = (px + 0.5) / size * 2.0 - 1.0
        uv_y = (py + 0.5) / size * 2.0 - 1.0
        d = uv_x[:, None] * cam.right[None] + uv_y[:, None] * cam.up[None] \
            + cam.forward[None]
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o = jnp.broadcast_to(cam.position[None], d.shape)
        mask = jnp.ones((d.shape[0],), bool)

        if os.environ.get("KVC_MISS"):
            d = -d  # rays point away from the scene: zero visits
        if args.rays == "bounce":
            # Realistic bounce-1 workload: cosine-hemisphere directions
            # around the primary geometric normal, compacted + dir6-sorted
            # exactly like renderer.render_rays does between bounces.
            import metal_raytracing_tpu.sampling as sampling

            hit = trace_pallas.trace_closest(
                o, d, mask, data.sup_planes, data.clu_planes,
                data.tri_planes, spec.bvh, block=128)
            tri = jnp.maximum(hit.tri, 0)
            row = data.shade_table[tri]
            nrow = row[:, 16:19]
            nrm = nrow / jnp.linalg.norm(nrow, axis=-1, keepdims=True)
            nrm = jnp.where((jnp.sum(nrm * d, axis=-1) > 0)[:, None],
                            -nrm, nrm)
            pos = o + d * jnp.where(hit.found, hit.t, 0.0)[:, None]
            idx = jnp.arange(d.shape[0], dtype=jnp.int32)
            r2 = jnp.stack([sampling.halton(idx, 11),
                            sampling.halton(idx, 13)], axis=-1)
            local = sampling.sample_cosine_weighted_hemisphere(r2)
            nd = sampling.align_hemisphere_with_normal(local, nrm)
            no = pos + nrm * 1e-3
            alive = hit.found
            m512 = R._morton_512(no, data)
            q = jnp.clip(((nd + 1.0) * 2).astype(jnp.int32), 0, 3)
            dirq = (q[:, 0] << 4) | (q[:, 1] << 2) | q[:, 2]
            key = (dirq << 24) | (m512 >> 3)
            key = jnp.where(alive, key, jnp.int32(2 ** 30))
            s = jax.lax.sort((key, no[:, 0], no[:, 1], no[:, 2],
                              nd[:, 0], nd[:, 1], nd[:, 2]),
                             dimension=0, is_stable=False, num_keys=1)
            o = jnp.stack(s[1:4], axis=1)
            d = jnp.stack(s[4:7], axis=1)
            mask = s[0] < jnp.int32(2 ** 30)
            o, d, mask = jax.device_put(o), jax.device_put(d), \
                jax.device_put(mask)
        f = jax.jit(lambda o, d, m: trace_pallas.trace_closest(
            o, d, m, data.sup_planes, data.clu_planes, data.tri_planes,
            spec.bvh, block=128, exact_uv=False).t)
        sync(f(o, d, mask))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = f(o, d, mask)
        sync(out)
        ms = (time.perf_counter() - t0) / args.reps * 1e3
        _, vis = trace_pallas.trace_closest(
            o, d, mask, data.sup_planes, data.clu_planes, data.tri_planes,
            spec.bvh, block=128, exact_uv=False, count_visits=True)
        v = np.asarray(vis)
        nb = v.shape[0]
        print(json.dumps({
            "cluster_size": csize,
            "ms": round(ms, 2),
            "blocks": int(nb),
            "visits_mean": round(float(v.mean()), 2),
            "visits_p90": round(float(np.percentile(v, 90)), 1),
            "us_per_block": round(float(ms * 1e3 / nb), 2),
            "us_per_visit": round(float(ms * 1e3 / max(float(v.sum()), 1.0)),
                                  3),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
