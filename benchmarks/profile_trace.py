"""Capture a REAL device profile of the render pipeline and aggregate op
time — evidence-grade cost attribution (round 4).

The round-3/4 ablation probes disagree with each other (the 51.6 ms
"stub floor" was a jit-boundary artifact; marginal-cost probes price the
same passes at a fraction of that), so this captures what the chip
actually runs: ``jax.profiler.trace`` around N steady-state samples,
then parses the trace-viewer JSON and sums device-lane durations by op
group (pallas kernels, sorts, gathers, fusions, ...).

    python benchmarks/profile_trace.py [--size 1024] [--samples 3] \
        [--scene dragon]

Prints one JSON line per op group (ms per sample) plus a total.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate(trace_dir: str, samples: int) -> dict:
    """Sum device-lane event durations by a coarse op grouping."""
    paths = glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pid whose process_name mentions TPU / device; fall
    # back to "every lane that is not clearly host python" if absent
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if re.search(r"TPU|/device|XLA Op", n, re.I)}
    groups: dict = {}
    ops: dict = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        lane = tid_names.get((e.get("pid"), e.get("tid")), "")
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        if not dev_pids and not re.search(r"XLA|TensorFlow Op|Steps",
                                          lane, re.I):
            continue
        # XLA Ops lane only (avoid double counting the step lane)
        if not re.search(r"XLA Ops|XLA TPU Ops|TensorFlow Ops", lane, re.I):
            continue
        name = e.get("name", "")
        ms = e["dur"] / 1e3
        total += ms
        key = classify(name)
        groups[key] = groups.get(key, 0.0) + ms
        ops[name] = ops.get(name, 0.0) + ms
    top = {k: round(v / max(1, samples), 2)
           for k, v in sorted(ops.items(), key=lambda kv: -kv[1])[:20]}
    return {"total_ms": total, "per_sample_ms": total / max(1, samples),
            "groups_ms_per_sample":
                {k: round(v / max(1, samples), 2)
                 for k, v in sorted(groups.items(), key=lambda kv: -kv[1])},
            "top_ops_ms_per_sample": top}


def classify(name: str) -> str:
    n = name.lower()
    if ("custom-call" in n or "tpu_custom_call" in n or "mosaic" in n
            # functools.partial-wrapped kernel bodies surface as
            # "_lambda_.N" XLA op names on this jaxlib
            or "_lambda_" in n or "_kernel" in n):
        return "pallas_kernel"
    if "sort" in n:
        return "sort"
    if "gather" in n:
        return "gather"
    if "scatter" in n:
        return "scatter"
    if "all-reduce" in n or "all-gather" in n:
        return "collective"
    if "copy" in n or "transpose" in n or "bitcast" in n:
        return "copy/layout"
    if "reduce" in n:
        return "reduce"
    if "fusion" in n:
        return "fusion"
    if "convert" in n:
        return "convert"
    return "other"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--dir", default="/tmp/prof_r4")
    ap.add_argument("--parse-only", action="store_true",
                    help="aggregate an existing trace dir, no TPU work")
    ap.add_argument("--set", action="append", default=[], dest="overrides",
                    help="RenderConfig override, e.g. --set rank_trace=2 "
                         "(int/bool/str literals via eval-lite)")
    args = ap.parse_args()

    if not args.parse_only:
        from metal_raytracing_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()

        import jax
        import jax.numpy as jnp

        from metal_raytracing_tpu import renderer as R
        from metal_raytracing_tpu.scenes import get_scene
        from metal_raytracing_tpu.types import RenderConfig
        from metal_raytracing_tpu.utils.profiling import sync

        over = {}
        for kv in args.overrides:
            k, _, v = kv.partition("=")
            try:
                over[k] = json.loads(v.lower() if v in ("True", "False")
                                     else v)
            except json.JSONDecodeError:
                over[k] = v
        cfg = RenderConfig(width=args.size, height=args.size, max_bounces=3,
                           tracer="pallas", samples_per_dispatch=1, **over)
        scene = get_scene(args.scene, args.size, args.size)
        data, spec = scene.build(cluster_size=cfg.cluster_size,
                                 builder=cfg.bvh_builder)
        offsets = R.make_pixel_offsets(cfg)
        f = jax.jit(lambda d, o, i: R.render_sample(d, spec, cfg, o, i)[0])
        sync(f(data, offsets, jnp.int32(0)))  # compile + warm
        with jax.profiler.trace(args.dir):
            out = None
            for k in range(args.samples):
                out = f(data, offsets, jnp.int32(k + 1))
            sync(out)
    print(json.dumps(aggregate(args.dir, args.samples)), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
