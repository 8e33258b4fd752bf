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
    # VERDICT round 3 #3 (Pallas shade-row fetch) is ANSWERED BY
    # MEASUREMENT, not a kernel: the x_shade marginal probe prices the
    # in-pipeline gather at +3.5 ms/sample — already below the 10 ms
    # "done" gate, so no DMA+select kernel is warranted.
    # pair_shared: two clusters per visit through ONE shared accumulator
    # (pair_visits' machinery amortization without its second live
    # accumulator — the measured -7% register-pressure suspect)
    ("pairshared", dict(visit_pairs2=True)),
    # k samples per dispatch on the LARGE scene: the r4 profile shows
    # ~169 ms device time vs ~190 ms wall — if the gap is dispatch/host
    # bubbles, folding 4 samples into one dispatch recovers most of it
    ("spd2", dict(samples_per_dispatch=2)),
    ("spd4", dict(samples_per_dispatch=4)),
    ("spd8", dict(samples_per_dispatch=8)),
    ("spd16", dict(samples_per_dispatch=16)),
    ("pairshared_spd4", dict(visit_pairs2=True, samples_per_dispatch=4)),
    # legacy two-pass rank-2 broad phase (the new default is ONE variadic
    # (min, second-min) reduce — the profile showed XLA rematerializing
    # the whole (N, NC) slab chain for the second pass, ~4.6 ms/call)
    ("rank2_twopass", dict(_rank2_twopass=True)),
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
    # per-bounce key proxies (batch r4-5): the VALID x_bp marginal prices
    # one exact (N, NC) chain at +11.6 ms while late-bounce populations
    # have collapsed (shadow_frac b2 = 0.11, live b2 = 0.45) and the
    # bounce-2 shadow KERNEL is only ~4 ms — swap exact keys for the
    # free hit-cluster proxy exactly where the population is small
    ("sh2", dict(shadow_hit_key_from=2)),
    ("sh1", dict(shadow_hit_key_from=1)),
    ("bh2", dict(bounce_hit_key_from=2)),
    ("sh2bh2", dict(shadow_hit_key_from=2, bounce_hit_key_from=2)),
    ("sh1bh2", dict(shadow_hit_key_from=1, bounce_hit_key_from=2)),
    # reverse A/B after the sh2 default adoption (batch r4-5: 176.9 vs
    # 178.8): exact shadow keys everywhere, from the NEW default
    ("shexact", dict(shadow_hit_key_from=99)),
    # removal-side shade-gather price (image wrong, timing only):
    # cross-checks x_shade's +51 ms addition-side reading
    ("x_shadestub", dict(_ablate="shade_stub")),
    # primary-shadow re-sort under the round-4 defaults (last measured
    # neutral-positive in the round-2 config; primary any is now the
    # 3rd-biggest kernel at 14.8 ms with unsorted camera-order rays)
    ("ssp", dict(shadow_sort_primary=True)),
    # round-5 scouting under the FINAL round-4 defaults: shadow_key2 on
    # the remaining exact shadow chains (b0/b1; lost under r3 defaults),
    # and sh1 (b1 shadow proxy too; batch r4-5 read it neutral vs sh2)
    ("sk2", dict(shadow_key2=True)),
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
    from metal_raytracing_tpu.ops import trace_pallas as TP

    glob_state = (frozenset(), False)
    for name, over in variants:
        want_state = (
            frozenset(over["_ablate"].split("+")) if "_ablate" in over
            else frozenset(),
            bool(over.get("_rank2_twopass", False)))
        if want_state != glob_state:
            # module-global-only variants (_ablate/_rank2_twopass) leave
            # the static (cfg, spec, k) key unchanged — the module-level
            # jitted _progressive_step would silently return the cached
            # program traced under the PREVIOUS global state and the
            # probe would measure the anchor (round-4 review finding;
            # batch r4-3's rank2 A/B was void).  Clear the trace cache
            # whenever the globals change, in EITHER direction; the
            # persistent XLA cache still dedupes identical HLO, so this
            # only costs a re-trace.
            R._progressive_step.clear_cache()
        glob_state = want_state
        R.ABLATE_EXTRA, TP.RANK2_TWO_PASS = want_state
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

        # production progressive path (exercises samples_per_dispatch;
        # same donated-accumulator stepping the bench/CLI use)
        k = cfg.samples_per_dispatch or 1
        accum = jnp.zeros((size, size, 3))
        totals = jnp.zeros((2,))

        def step(d, o, fi, a, t):
            # _progressive_step is already jitted (static spec/cfg/k,
            # donated accumulators)
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
                lambda d, o: R.render_sample(d, spec, tcfg, o, jnp.int32(0)))(
                    data, offsets)
            from metal_raytracing_tpu.utils.metrics import visit_percentiles

            line.update(visit_percentiles(stats, pixels=size * size))
        except Exception as e:
            line["telemetry_error"] = str(e)[:120]
        print(json.dumps(line), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
