"""Benchmark harness: Mrays/s (primary+shadow) on the dragon scene + ladder.

Prints the headline metric as ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}
followed by one JSON line per additional ladder scene (the full
BASELINE.json config ladder by default — plane_sphere, teapot, bunny_env,
coatball; VERDICT round 3 #7) so the recorded BENCH artifact captures
cross-scene regressions, not just the dragon headline.

The reference publishes no numbers (SURVEY.md §6); the baseline is the
north-star target from BASELINE.json: >= 50 Mrays/s sustained on the dragon
scene at 1024x1024 on one TPU v5e chip.  ``vs_baseline`` is value / 50.

Cross-process tunnel variance is ~±5% (BASELINE.md batch21), so the
headline line also carries a SAME-PROCESS ANCHOR: the round-3-close
configuration (pinned in ``_ANCHOR_OVERRIDES``, never to change) measured
in this process.  ``headline_over_anchor`` < 1 is a real speedup and
> 1 a real regression regardless of tunnel conditions (VERDICT round 3
#5/weak 6).

Environment knobs:
    BENCH_SIZE=1024      image width == height (headline scene)
    BENCH_SAMPLES=8      timed progressive samples (after 1 warmup)
    BENCH_SCENE=dragon
    BENCH_TRACER=auto    auto | bvh | pallas | bruteforce
    BENCH_LADDER=plane_sphere,teapot,bunny_env,coatball  ('' to disable)
    BENCH_ANCHOR=1       measure the pinned round-3 anchor config ('0' off)
    BENCH_FEEDBACK=0     '1': refine() (feedback re-cluster, sah_rays)
                         before timing; the anchor never refines
"""

from __future__ import annotations

import json
import os
import sys

# The round-3-close configuration, pinned forever as the same-process
# anchor.  Every perf-relevant knob is spelled out explicitly — config
# DEFAULTS evolve round over round, the anchor must not.  New knobs added
# after round 3 must be pinned here to their round-3-equivalent (off)
# value.
_ANCHOR_OVERRIDES = dict(
    tracer="pallas",
    cluster_size=384,
    bvh_builder="sah_free",
    bvh_presplit=0.0,
    chunk_skip=False,
    host_seed=True,
    bake_primary=False,
    shadow_hit_key=False,
    shadow_key2=False,
    visit_pairs=False,
    ray_block=128,
    primary_ray_block=512,
    shadow_ray_block=512,
    compaction=True,
    sort_bounces=True,
    sort_last_bounce=True,
    sort_pack_f16=False,
    sort_key="cluster2",
    cluster_miss_fold=True,
    shadow_sort=True,
    shadow_sort_primary=False,
    # round-4+ knobs, pinned to their round-3-equivalent values
    samples_per_dispatch=1,
    live_widths=0,
    carry_seed=False,
    fused_broadphase=False,
    shadow_mid_order=False,
    shadow_ray_block_last=0,
    sort_primary=False,
    visit_pairs2=False,
    shadow_hit_key_from=99,
    bounce_hit_key_from=99,
    bvh_alpha=2.0,
    broadphase_block=256,
    live_from_bounce=1,
    # round-5 knobs, pinned OFF (round-3 equivalent)
    rank_trace=0,
    pair_broadphase=False,
)

# RenderConfig fields that are IMAGE-SEMANTICS or observability only — they
# change what is rendered (or what is recorded), never how fast the pinned
# anchor configuration runs, so they are exempt from anchor pinning.  Every
# other RenderConfig field MUST appear in _ANCHOR_OVERRIDES; a test
# (tests/test_bench_anchor.py) enforces the partition so a new perf knob
# that isn't pinned fails CI the commit it lands (VERDICT round 4 weak #3).
_ANCHOR_NEUTRAL = frozenset({
    "width", "height", "spp", "max_bounces", "rand_offset_bits", "seed",
    "enable_specular", "enable_emission", "enable_refraction",
    "enable_textures", "texture_filter", "env_map", "telemetry",
    "export_rays",
})


def _anchor_config(w, h, cls):
    """Anchor RenderConfig, dropping pinned knobs this build predates."""
    import dataclasses

    fields = {f.name for f in dataclasses.fields(cls)}
    kw = {k: v for k, v in _ANCHOR_OVERRIDES.items() if k in fields}
    return cls(width=w, height=h, max_bounces=3, **kw)


def _bench_scene(scene_name: str, size, samples: int, tracer: str,
                 telemetry: bool, anchor: bool = False):
    """One scene's benchmark line (dict).  ``size`` is (w, h)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from metal_raytracing_tpu.renderer import Renderer, render_sample
    from metal_raytracing_tpu.scenes import get_scene
    from metal_raytracing_tpu.types import RenderConfig
    from metal_raytracing_tpu.utils.metrics import benchmark_renderer

    w, h = size
    scene = get_scene(scene_name, w, h)
    # Env knobs override RenderConfig fields ONLY when set; otherwise the
    # config defaults (tuned in types.py — e.g. primary/shadow_ray_block)
    # apply.  Round-3 lesson: unconditionally passing None here silently
    # defeated the pb512 default (279 vs 253 ms/sample on dragon).
    overrides = {}
    if os.environ.get("BENCH_RAY_BLOCK"):
        overrides["ray_block"] = int(os.environ["BENCH_RAY_BLOCK"])
    if os.environ.get("BENCH_PRIMARY_BLOCK"):
        overrides["primary_ray_block"] = int(os.environ["BENCH_PRIMARY_BLOCK"])
    if os.environ.get("BENCH_PRESPLIT"):
        overrides["bvh_presplit"] = float(os.environ["BENCH_PRESPLIT"])
    if os.environ.get("BENCH_SORT_KEY"):
        overrides["sort_key"] = os.environ["BENCH_SORT_KEY"]
    cfg = RenderConfig(
        width=w, height=h, max_bounces=3, tracer=tracer, **overrides)
    renderer = Renderer(scene, cfg)
    feedback = os.environ.get("BENCH_FEEDBACK", "0") != "0"
    if feedback and cfg.tracer in ("auto", "pallas"):
        # Feedback-driven re-cluster before timing (round 5): render one
        # sample, export the measured ray distribution, rebuild the
        # cluster BVH with the sah_rays builder (Renderer.refine).  The
        # anchor below never refines, so headline_over_anchor captures
        # the win/loss under tunnel variance.  Off by default until the
        # chip A/B adopts it (BASELINE.md round 5).
        renderer.step(1)
        refined = renderer.refine()
        line_extra = {"feedback_refined": bool(refined)}
    else:
        line_extra = {}
    result = benchmark_renderer(renderer, samples=samples, warmup=1)

    value = result.mrays_per_sec
    line = {
        "metric": (f"Mrays/s primary+shadow, {scene_name} scene "
                   f"{w}x{h}, tracer={tracer}"),
        "value": round(value, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(value / 50.0, 4),
        "ms_per_sample": round(result.per_sample_seconds * 1e3, 1),
        **line_extra,
    }
    if anchor:
        # Same-process anchor: the pinned round-3-close config, measured
        # back-to-back with the headline so tunnel-speed variance divides
        # out of headline/anchor (see module docstring).
        acfg = _anchor_config(w, h, RenderConfig)
        arenderer = Renderer(scene, acfg)
        aresult = benchmark_renderer(arenderer, samples=max(samples // 2, 2),
                                     warmup=1)
        a_ms = aresult.per_sample_seconds * 1e3
        line["anchor_ms_per_sample"] = round(a_ms, 1)
        line["anchor_mrays"] = round(aresult.mrays_per_sec, 3)
        line["headline_over_anchor"] = round(
            result.per_sample_seconds * 1e3 / max(a_ms, 1e-9), 4)
    if telemetry and (jax.default_backend() == "tpu" or tracer == "pallas"):
        # Clusters-visited telemetry (pallas tracer): one instrumented sample.
        from metal_raytracing_tpu.utils.metrics import visit_percentiles

        tcfg = dataclasses.replace(cfg, telemetry=True)
        _, stats = jax.jit(
            lambda d, o: render_sample(d, renderer.spec, tcfg, o,
                                       jnp.int32(0)))(
                renderer.data, renderer.offsets)
        line.update(visit_percentiles(stats, pixels=w * h))
    diag = (f"# {scene_name}: {result.rays} rays in {result.seconds:.3f}s "
            f"over {result.samples} samples; compile+warmup "
            f"{result.compile_seconds:.1f}s; 64spp frame ~= "
            f"{result.frame_seconds(64):.1f}s; "
            f"{scene.triangle_count} triangles")
    return line, diag


# Ladder scene shapes (BASELINE.json config ladder; dragon is the headline).
_LADDER_SIZES = {
    "plane_sphere": (256, 256),
    "teapot": (512, 512),
    "bunny_env": (512, 512),
    "coatball": (1024, 768),
    "uv_test": (256, 256),
}


def main() -> int:
    size = int(os.environ.get("BENCH_SIZE", "1024"))
    samples = int(os.environ.get("BENCH_SAMPLES", "8"))
    scene_name = os.environ.get("BENCH_SCENE", "dragon")
    tracer = os.environ.get("BENCH_TRACER", "auto")
    ladder = [s for s in os.environ.get(
        "BENCH_LADDER",
        "plane_sphere,teapot,bunny_env,coatball").split(",") if s]
    anchor = os.environ.get("BENCH_ANCHOR", "1") != "0"

    from metal_raytracing_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    line, diag = _bench_scene(scene_name, (size, size), samples, tracer,
                              telemetry=True, anchor=anchor)
    print(json.dumps(line), flush=True)
    print(diag, file=sys.stderr)

    ladder_mrays = {scene_name: line["value"]}
    for name in ladder:
        if name == scene_name:
            continue
        try:
            lsize = _LADDER_SIZES.get(name, (512, 512))
            lline, ldiag = _bench_scene(name, lsize, samples, tracer,
                                        telemetry=True)
            print(json.dumps(lline), flush=True)
            print(ldiag, file=sys.stderr)
            ladder_mrays[name] = lline["value"]
        except Exception as e:  # a ladder failure must not mask the headline
            print(f"# ladder scene {name} failed: {e}", file=sys.stderr)
    if ladder:
        # Re-emit the HEADLINE as the final JSON line: the driver's
        # machine-readable `parsed` block takes the LAST line, and the
        # round-3 artifact silently recorded the last LADDER scene
        # (coatball) instead of the dragon headline, breaking the
        # cross-round parsed.value series (round-4 review finding).
        # The compact `ladder` dict rides IN the same final line so the
        # driver's tail capture can never truncate away the small-scene
        # configs again (VERDICT round 4 weak #4) while the parsed
        # headline value stays the dragon number.
        print(json.dumps(dict(line, headline_reemit=True,
                              ladder=ladder_mrays)), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
