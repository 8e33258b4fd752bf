"""Round-3 perf sweep: dead-tile skip + presplit + primary block size.

Times the dragon 1024x1024 3-bounce pipeline across the round-3 config
variants in ONE process (shared tunnel setup; per-config jit compiles hit
the persistent cache on reruns).  Prints one JSON line per variant.

    python benchmarks/sweep_r3.py [--size 1024] [--samples 2]
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
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--variants", default="")
    args = ap.parse_args()

    from metal_raytracing_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from metal_raytracing_tpu import renderer as R
    from metal_raytracing_tpu.scenes import get_scene
    from metal_raytracing_tpu.types import RenderConfig
    from metal_raytracing_tpu.utils.profiling import sync

    size = args.size
    base = RenderConfig(width=size, height=size, max_bounces=3,
                        tracer="pallas", ray_block=128)

    # (name, cfg overrides) — scene rebuilds when presplit/cluster differ.
    variants = [
        ("r2_noflags", dict(bvh_presplit=0.0)),
        ("presplit03", dict(bvh_presplit=0.3)),
        ("presplit03_pb512", dict(bvh_presplit=0.3, primary_ray_block=512)),
        ("presplit03_pb256", dict(bvh_presplit=0.3, primary_ray_block=256)),
        ("presplit06", dict(bvh_presplit=0.6)),
        ("c256", dict(cluster_size=256)),
        ("c512", dict(cluster_size=512)),
        ("pb1024", dict(primary_ray_block=1024)),
        ("bounce256", dict(ray_block=256)),
        ("bounce512", dict(ray_block=512)),
        # seed-path A/B: force the dense 128-wide chunk global seed even
        # for small global sets (monkeypatches GLOBAL_SCALAR_MAX)
        ("seedchunk", dict(_seed_scalar_max=0)),
        # scalar seed with the plane rows as jit-time IMMEDIATE constants
        # (BVHSpec.global_planes) — no SMEM load chains, the suspected
        # cause of the SMEM-scalar variant's loss
        ("seedconst", dict(_seed_scalar_max=8)),
        # finer 512-cone direction key: measured ~neutral pre-global-seed
        # when fixed cost dominated; visits now dominate, so finer
        # coherence deserves a re-measure
        ("dir9", dict(sort_key="dir9")),
        ("bounce64", dict(ray_block=64)),
        ("c128", dict(cluster_size=128)),
        # the global seed resolves most shadow occlusion (zero-visit
        # fraction ~0.83) — the dedicated shadow re-sort may no longer
        # pay for its two sorts
        ("noshadowsort", dict(shadow_sort=False)),
        ("nosort", dict(sort_bounces=False)),
        # unquantized cluster-granular SAH: ~11% lower total cluster SA
        # at ~20% more (partially-full) clusters
        ("sahfree", dict(bvh_builder="sah_free")),
        ("sahfree_c512", dict(bvh_builder="sah_free", cluster_size=512)),
        ("sahfree_c256", dict(bvh_builder="sah_free", cluster_size=256)),
        # chunk-granular cost model + the kernels' partial-cluster chunk
        # skip; alpha = per-visit machinery in chunk-test units
        ("sahchunk", dict(bvh_builder="sah_chunk")),
        ("sahchunk_a1", dict(bvh_builder="sah_chunk", bvh_alpha=1.0)),
        ("sahchunk_a4", dict(bvh_builder="sah_chunk", bvh_alpha=4.0)),
        ("sahchunk_c512", dict(bvh_builder="sah_chunk", cluster_size=512)),
        # bigger blocks for the re-sorted bounce shadow passes (82%
        # zero-visit -> fixed-cost-bound)
        ("shadowb256", dict(shadow_ray_block=256)),
        ("shadowb512", dict(shadow_ray_block=512)),
        # c640/c768 need IDX_BITS=10; measured FLAT vs c512 (275.8/275.7,
        # visits 9.8/8.7) — visit reduction no longer converts to time,
        # the per-tile fixed cost is the floor.  Variants removed.
        ("sahfree_c512_noskip", dict(bvh_builder="sah_free",
                                     cluster_size=512, chunk_skip=False)),
        ("sahfree_c512_sb512", dict(bvh_builder="sah_free",
                                    cluster_size=512,
                                    shadow_ray_block=512)),
        # host-side global seed A/B (default ON): per-ray seed keys +
        # pre-sort shadow occlusion fold
        ("hostseed_off", dict(host_seed=False)),
        ("best_combo", dict(bvh_builder="sah_free", cluster_size=512,
                            shadow_ray_block=512)),
        # primary-shadow re-sort re-measure: pre-host-seed it was neutral
        # (398 vs 402); now the host-seed occlusion fold compacts the
        # g_occ rays into fully-dead tiles ONLY under the re-sort, and
        # sorted shadow passes get sblock=512 amortization
        ("shadowsort_primary", dict(shadow_sort_primary=True)),
        # nearest-cluster broad-phase bounce key: blocks share their first
        # traversal visit by construction (the dominant cost is bounce
        # visits x dense tests, and dir6 only approximates target
        # coherence)
        ("cluster1", dict(sort_key="cluster1")),
        ("cluster1_nofold", dict(sort_key="cluster1",
                                 cluster_miss_fold=False)),
        # bigger bounce blocks under the cluster1 key: blocks share their
        # first visit by construction, so the coherence collapse that made
        # rb256/rb512 lose under dir6 may no longer apply — and block-size
        # fixed cost is the measured floor
        ("cluster1_rb256", dict(sort_key="cluster1", ray_block=256)),
        ("cluster1_rb512", dict(sort_key="cluster1", ray_block=512)),
        # skip the final bounce's compaction sort (one fewer 15-operand
        # 1M sort; the last bounce inherits the previous order)
        ("sortlast0", dict(sort_last_bounce=False)),
        ("cluster1_sortlast0", dict(sort_key="cluster1",
                                    sort_last_bounce=False)),
        # f16-pair packed throughput/radiance sort payload (15 -> 12
        # operands on the 1M-row bounce compaction sorts)
        ("packf16", dict(sort_pack_f16=True)),
        # shadow blocks are ~82% zero-visit (fixed-cost-bound) — push the
        # amortization one more doubling past the adopted sb512
        ("shadowb1024", dict(shadow_ray_block=1024)),
        # endgame combo: every individually-queued knob at once, so a
        # candidate new default gets a same-process number next to its
        # components (cluster1 + skip-last-sort + f16 sort payload)
        ("endgame", dict(sort_key="cluster1", sort_last_bounce=False,
                         sort_pack_f16=True)),
        ("endgame_rb256", dict(sort_key="cluster1", sort_last_bounce=False,
                               sort_pack_f16=True, ray_block=256)),
        # --- batch13: re-measures UNDER the adopted cluster1 default ---
        # cluster1 folded most dead tiles, so per-tile fixed cost no
        # longer masks visit reductions — builder/cluster-size knobs that
        # measured flat under dir6 deserve a re-run (c640/c768 stayed
        # removed: they need IDX_BITS=10).
        ("dir6", dict(sort_key="dir6")),  # old-default anchor
        # primary block size: pb512 was adopted pre-cluster1; the primary
        # closest pass is now ~42 ms standalone and its per-visit dense
        # cost scales with R — re-probe the neighbors
        ("pb256", dict(primary_ray_block=256)),
        # finer 512-cone secondary direction bits under the cluster1 id
        ("cluster1_dir9", dict(sort_key="cluster1_dir9")),
        # batch14/15 winners composed: dir9 cones (-4.5%) + pb1024 (-2.3%)
        ("dir9_pb1024", dict(sort_key="cluster1_dir9",
                             primary_ray_block=1024)),
        # second-nearest cluster id below the first in the bounce key
        ("cluster2", dict(sort_key="cluster2")),
        # camera origin baked into the primary pass's scene planes
        ("baked", dict(bake_primary=True)),
        # cheap broad phases: hit-cluster shadow key / hit-cluster bounce
        # key with super-level fold
        ("shadowhit", dict(shadow_hit_key=True)),
        ("cluster1_hit", dict(sort_key="cluster1_hit")),
        ("cheapkeys", dict(sort_key="cluster1_hit", shadow_hit_key=True)),
        # everything that might win, composed
        ("combo_r3b", dict(bake_primary=True, sort_key="cluster1_hit",
                           shadow_hit_key=True)),
        # with the free shadow key, re-sorting PRIMARY shadows may now
        # pay: the g_occ fold only compacts into dead tiles under a sort
        ("shadowhit_sp", dict(shadow_hit_key=True,
                              shadow_sort_primary=True)),
        # cluster2 (batch17: 184.4 vs 192.0, bounce visits mean 8.25 ->
        # 5.65) composed with the other candidate wins
        ("cluster2_shadowhit", dict(sort_key="cluster2",
                                    shadow_hit_key=True)),
        ("baked_cluster2", dict(bake_primary=True, sort_key="cluster2")),
        ("combo_r3c", dict(bake_primary=True, sort_key="cluster2",
                           shadow_hit_key=True, shadow_sort_primary=True)),
        # under cluster2's much tighter grouping (visits mean 5.65),
        # bigger bounce blocks may stop losing: the superlinear
        # visits-per-block growth was the dir6/cluster1-era objection
        ("cluster2_rb256", dict(sort_key="cluster2", ray_block=256)),
        # low-bit ablations under cid1|cid2: direction cone vs Morton vs
        # a third cluster id
        ("cluster2_nodir", dict(sort_key="cluster2_nodir")),
        ("cluster3", dict(sort_key="cluster3")),
        # shadow-side second id under the cluster2 bounce key
        ("cluster2_sk2", dict(sort_key="cluster2", shadow_key2=True)),
        # cluster-size re-probe under cluster2's changed visit economics
        ("cluster2_c256", dict(sort_key="cluster2", cluster_size=256)),
        ("cluster2_c512", dict(sort_key="cluster2", cluster_size=512)),
        # two dense tests per inner-loop iteration (machinery amortizer)
        ("pairs", dict(visit_pairs=True)),
        ("skip_on", dict(chunk_skip=True)),
        ("sahfree_c512_skip", dict(bvh_builder="sah_free", cluster_size=512,
                                   chunk_skip=True)),
        ("sahfree_skip", dict(bvh_builder="sah_free", chunk_skip=True)),
    ]
    if args.variants:
        keep = set(args.variants.split(","))
        variants = [v for v in variants if v[0] in keep]

    scene = get_scene(args.scene, size, size)
    built = {}  # (presplit, cluster_size) -> (data, spec)

    from metal_raytracing_tpu.ops import trace_pallas

    default_scalar_max = trace_pallas.GLOBAL_SCALAR_MAX
    for name, over in variants:
        over = dict(over)
        trace_pallas.GLOBAL_SCALAR_MAX = over.pop(
            "_seed_scalar_max", default_scalar_max)
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
                "padded_tris": spec.bvh.padded_triangles,
                "clusters": spec.bvh.num_clusters}
        # one telemetry sample for visit stats
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
