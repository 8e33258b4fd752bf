"""Full BASELINE.json config-ladder benchmark with traversal telemetry.

Emits one JSON line per ladder config (plane_sphere -> teapot -> bunny_env ->
dragon -> coatball), each carrying Mrays/s, ms/sample, per-bounce wavefront
occupancy, and clusters-visited p50/p90 (pallas tracer) — the table
BASELINE.md promises (SURVEY.md §6; VERDICT.md round 1 next-step 4).

The driver-facing single-line contract stays in ``bench.py``; this script is
the wide view.  Run on the TPU host:

    python benchmarks/ladder.py [--samples 3] [--tracer auto] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


LADDER = [
    # BASELINE.json configs[0..4]
    dict(name="plane_sphere", size=(256, 256), bounces=1),
    dict(name="teapot", size=(512, 512), bounces=3),
    dict(name="bunny_env", size=(512, 512), bounces=3, env_map=True),
    dict(name="dragon", size=(1024, 1024), bounces=3),
    dict(name="coatball", size=(1024, 768), bounces=3,
         specular=True, emission=True),
]


def bench_config(entry: dict, samples: int, tracer: str) -> dict:
    import numpy as np

    from metal_raytracing_tpu.renderer import Renderer, render_sample
    from metal_raytracing_tpu.scenes import get_scene
    from metal_raytracing_tpu.types import RenderConfig
    from metal_raytracing_tpu.utils.metrics import benchmark_renderer

    w, h = entry["size"]
    scene = get_scene(entry["name"], w, h)
    cfg = RenderConfig(
        width=w, height=h, max_bounces=entry["bounces"], tracer=tracer,
        ray_block=128,
        env_map=entry.get("env_map", False) and scene.env_map is not None,
        enable_specular=entry.get("specular", False),
        enable_emission=entry.get("emission", False))
    t0 = time.perf_counter()
    r = Renderer(scene, cfg)
    build_s = time.perf_counter() - t0

    result = benchmark_renderer(r, samples=samples, warmup=1)
    row = {
        "config": entry["name"],
        "size": f"{w}x{h}",
        "bounces": entry["bounces"],
        "triangles": scene.triangle_count,
        "tracer": tracer,
        "mrays_per_sec": round(result.mrays_per_sec, 3),
        "ms_per_sample": round(result.per_sample_seconds * 1e3, 1),
        "build_s": round(build_s, 2),
        "compile_s": round(result.compile_seconds, 1),
    }

    # One instrumented sample for occupancy + clusters-visited telemetry.
    import dataclasses

    import jax
    import jax.numpy as jnp

    tcfg = dataclasses.replace(cfg, telemetry=True)
    _, stats = jax.jit(
        lambda d, o: render_sample(d, r.spec, tcfg, o, jnp.int32(0)))(
            r.data, r.offsets)
    n_px = w * h
    occ = [round(int(stats[f"live_b{b}"]) / n_px, 4)
           for b in range(cfg.max_bounces) if f"live_b{b}" in stats]
    row["occupancy_per_bounce"] = occ
    shadow = [int(stats[f"shadow_b{b}"]) for b in range(cfg.max_bounces)
              if f"shadow_b{b}" in stats]
    row["shadow_fraction_per_bounce"] = [round(s / n_px, 4) for s in shadow]
    from metal_raytracing_tpu.utils.metrics import visit_percentiles

    row.update(visit_percentiles(stats))
    return row


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--tracer", default="auto")
    ap.add_argument("--out", default=None, help="also append JSONL here")
    ap.add_argument("--only", default=None,
                    help="comma-separated config names")
    args = ap.parse_args()

    from metal_raytracing_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    only = set(args.only.split(",")) if args.only else None
    rows = []
    for entry in LADDER:
        if only and entry["name"] not in only:
            continue
        row = bench_config(entry, args.samples, args.tracer)
        rows.append(row)
        print(json.dumps(row), flush=True)
        if args.out:
            with open(args.out, "a") as f:
                f.write(json.dumps(row) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
