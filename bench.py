"""Benchmark harness: Mrays/s (primary+shadow) on the dragon scene.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}

The reference publishes no numbers (SURVEY.md §6); the baseline is the
north-star target from BASELINE.json: >= 50 Mrays/s sustained on the dragon
scene at 1024x1024 on one TPU v5e chip.  ``vs_baseline`` is value / 50.

Environment knobs:
    BENCH_SIZE=1024      image width == height
    BENCH_SAMPLES=4      timed progressive samples (after 1 warmup)
    BENCH_SCENE=dragon
    BENCH_TRACER=bvh     bvh | pallas | bruteforce
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    size = int(os.environ.get("BENCH_SIZE", "1024"))
    samples = int(os.environ.get("BENCH_SAMPLES", "3"))
    scene_name = os.environ.get("BENCH_SCENE", "dragon")
    tracer = os.environ.get("BENCH_TRACER", "auto")

    from metal_raytracing_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from metal_raytracing_tpu.renderer import Renderer
    from metal_raytracing_tpu.scenes import get_scene
    from metal_raytracing_tpu.types import RenderConfig
    from metal_raytracing_tpu.utils.metrics import benchmark_renderer

    scene = get_scene(scene_name, size, size)
    cfg = RenderConfig(width=size, height=size, max_bounces=3, tracer=tracer,
                       ray_block=int(os.environ.get("BENCH_RAY_BLOCK", "128")))
    renderer = Renderer(scene, cfg)
    result = benchmark_renderer(renderer, samples=samples, warmup=1)

    value = result.mrays_per_sec
    line = {
        "metric": (f"Mrays/s primary+shadow, {scene_name} scene "
                   f"{size}x{size}, tracer={tracer}"),
        "value": round(value, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(value / 50.0, 4),
    }

    # Clusters-visited telemetry (pallas tracer): one instrumented sample.
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from metal_raytracing_tpu.renderer import render_sample

    if jax.default_backend() == "tpu" or tracer == "pallas":
        from metal_raytracing_tpu.utils.metrics import visit_percentiles

        tcfg = dataclasses.replace(cfg, telemetry=True)
        _, stats = jax.jit(
            lambda d, o: render_sample(d, renderer.spec, tcfg, o,
                                       jnp.int32(0)))(
                renderer.data, renderer.offsets)
        line.update(visit_percentiles(stats))
    print(json.dumps(line))
    # Diagnostics on stderr (not part of the JSON contract).
    print(
        f"# {result.rays} rays in {result.seconds:.3f}s over "
        f"{result.samples} samples; compile+warmup {result.compile_seconds:.1f}s; "
        f"64spp frame ~= {result.frame_seconds(64):.1f}s; "
        f"{scene.triangle_count} triangles",
        file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
