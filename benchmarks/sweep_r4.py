"""Round-4 perf sweep: pipeline restructuring A/Bs (VERDICT round 3).

Times the dragon 1024x1024 3-bounce pipeline across round-4 variants in
ONE process (cross-process tunnel variance is ~±5%, BASELINE.md batch21 —
only same-process deltas are trustworthy).  Prints one JSON line per
variant.  The ``default`` variant is the same-process anchor; run it in
every batch.

    python benchmarks/sweep_r4.py [--size 1024] [--samples 3] \
        [--variants default,midorder]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


VARIANTS = [
    # same-process anchor: current round-4 defaults
    ("default", dict()),
    # visit shadow candidates nearest the SEGMENT MIDDLE first (bit-
    # identical any-hit; aims at the bounce-2 shadow exhaustion tail,
    # VERDICT round 3 #4 — occluders sit between surface and light)
    ("midorder", dict(shadow_mid_order=True)),
    # Pallas shade-row fetch (VERDICT round 3 #3): DMA the hit slab +
    # one-hot MXU select instead of the 1M-row XLA gather
    ("shadefetch", dict(shade_fetch=True)),
    ("shadefetch_b256", dict(shade_fetch=True, shade_fetch_block=256)),
    ("shadefetch_b1024", dict(shade_fetch=True, shade_fetch_block=1024)),
    ("shadefetch_midorder", dict(shade_fetch=True, shadow_mid_order=True)),
    # bounce-0 compaction sort: cluster-key grouping + known-miss fold
    # for the PRIMARY pass (b1 is ~58% of the sample; primary visits
    # p50 = 0 — the floor-only majority can fold into dead blocks)
    ("sortprimary", dict(sort_primary=True)),
    ("sortprimary_sp", dict(sort_primary=True, shadow_sort_primary=True)),
    ("sortprimary_pb128", dict(sort_primary=True, primary_ray_block=128)),
    ("sortprimary_pb256", dict(sort_primary=True, primary_ray_block=256)),
    # last-bounce shadow block: smaller blocks shrink the UNION visit set
    # of the divergent bounce-2 segments (visits mean 14.57 at 512)
    ("shadowlast128", dict(shadow_ray_block_last=128)),
    ("shadowlast256", dict(shadow_ray_block_last=256)),
    ("shadowlast128_mid", dict(shadow_ray_block_last=128,
                               shadow_mid_order=True)),
    # marginal-cost probes (renderer.ABLATE_EXTRA): each ADDS one
    # redundant component copy per bounce; the delta vs the same-process
    # `default` anchor prices that component's true in-pipeline cost
    ("x_shade", dict(_ablate="shade_extra")),
    ("x_halton", dict(_ablate="halton_extra")),
    ("x_bp", dict(_ablate="bp_extra")),
    ("x_sort", dict(_ablate="sort_extra")),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--variants", default="")
    args = ap.parse_args()

    from metal_raytracing_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from metal_raytracing_tpu import renderer as R
    from metal_raytracing_tpu.scenes import get_scene
    from metal_raytracing_tpu.types import RenderConfig
    from metal_raytracing_tpu.utils.profiling import sync

    size = args.size
    base = RenderConfig(width=size, height=size, max_bounces=3,
                        tracer="pallas", samples_per_dispatch=1)

    variants = list(VARIANTS)
    if args.variants:
        keep = set(args.variants.split(","))
        variants = [v for v in variants if v[0] in keep]

    scene = get_scene(args.scene, size, size)
    built = {}
    cfg_fields = {f.name for f in dataclasses.fields(RenderConfig)}
    for name, over in variants:
        R.ABLATE_EXTRA = frozenset(
            over["_ablate"].split("+")) if "_ablate" in over else frozenset()
        unknown = [k for k in over
                   if k not in cfg_fields and not k.startswith("_")]
        if unknown:
            # running such a variant would silently duplicate `default`
            print(json.dumps({"variant": name,
                              "skipped_unknown_knobs": unknown}), flush=True)
            continue
        over = {k: v for k, v in over.items() if k in cfg_fields}
        cfg = dataclasses.replace(base, **over)
        key = (cfg.bvh_presplit, cfg.cluster_size, cfg.bvh_builder,
               cfg.bvh_alpha)
        if key not in built:
            built[key] = scene.build(cluster_size=cfg.cluster_size,
                                     builder=cfg.bvh_builder,
                                     presplit=cfg.bvh_presplit,
                                     builder_alpha=cfg.bvh_alpha)
        data, spec = built[key]
        offsets = R.make_pixel_offsets(cfg)

        f = jax.jit(lambda d, o, i: R.render_sample(d, spec, cfg, o, i)[0])
        t0 = time.perf_counter()
        sync(f(data, offsets, jnp.int32(0)))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for k in range(args.samples):
            out = f(data, offsets, jnp.int32(k + 1))
        sync(out)
        ms = (time.perf_counter() - t0) / args.samples * 1e3
        line = {"variant": name, "ms_per_sample": round(ms, 1),
                "compile_s": round(compile_s, 1),
                "clusters": spec.bvh.num_clusters}
        try:
            tcfg = dataclasses.replace(cfg, telemetry=True)
            _, stats = jax.jit(
                lambda d, o: R.render_sample(d, spec, tcfg, o, jnp.int32(0)))(
                    data, offsets)
            from metal_raytracing_tpu.utils.metrics import visit_percentiles

            line.update(visit_percentiles(stats))
        except Exception as e:
            line["telemetry_error"] = str(e)[:120]
        print(json.dumps(line), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
