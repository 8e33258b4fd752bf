"""Round-5 perf sweep: the traversal restructure A/Bs (VERDICT round 4).

Times the dragon 1024x1024 3-bounce pipeline across round-5 variants in
ONE process (cross-process tunnel variance is ~±5% — only same-process
deltas are trustworthy).  Prints one JSON line per variant; ``default``
is the same-process anchor, run it in every batch.

    python benchmarks/sweep_r5.py [--size 1024] [--samples 4] \
        [--variants default,rank2]
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
    # same-process anchor: CURRENT defaults (pair_broadphase adopted in
    # round 5; spd pinned to 1 in the base config so every variant times
    # the same dispatch pattern)
    ("default", dict()),
    # pre-adoption control: round-4-close defaults (pair off)
    ("nopair", dict(pair_broadphase=False)),
    # rank-directed cluster-major closest walk (VERDICT r4 #1), with the
    # order-preserving (0/1, idx) fallback compaction.  pair explicitly
    # OFF: the composition needs the 4-operand variadic reduce, measured
    # +13 ms (batches 1-2)
    ("rank2", dict(rank_trace=2, pair_broadphase=False)),
    # the broken composition, kept for reference
    ("rank2_pair", dict(rank_trace=2, pair_broadphase=True)),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--samples", type=int, default=4)
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
        unknown = [k for k in over
                   if k not in cfg_fields and not k.startswith("_")]
        if unknown:
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

        # production progressive path (donated accumulators, static cfg)
        k = cfg.samples_per_dispatch or 1
        accum = jnp.zeros((size, size, 3))
        totals = jnp.zeros((2,))

        def step(d, o, fi, a, t):
            return R._progressive_step(d, o, fi, a, t, spec=spec, cfg=cfg,
                                       k=k)

        t0 = time.perf_counter()
        a, tt = step(data, offsets, jnp.int32(0), accum, totals)
        sync(a)
        compile_s = time.perf_counter() - t0
        rounds = max(1, args.samples // k)
        t0 = time.perf_counter()
        for i in range(rounds):
            a, tt = step(data, offsets, jnp.int32(k + i * k), a, tt)
        sync(a)
        ms = (time.perf_counter() - t0) / (rounds * k) * 1e3
        line = {"variant": name, "ms_per_sample": round(ms, 1),
                "compile_s": round(compile_s, 1),
                "clusters": spec.bvh.num_clusters}
        try:
            tcfg = dataclasses.replace(cfg, telemetry=True)
            _, stats = jax.jit(
                lambda d, o: R.render_sample(d, spec, tcfg, o,
                                             jnp.int32(0)))(data, offsets)
            from metal_raytracing_tpu.utils.metrics import visit_percentiles

            line.update(visit_percentiles(stats, pixels=size * size))
            for sk, sv in sorted(stats.items()):
                if sk.startswith("rank_unresolved"):
                    line[sk] = int(sv)
        except Exception as e:
            line["telemetry_error"] = str(e)[:120]
        print(json.dumps(line), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
