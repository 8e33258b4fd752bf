"""Offline cluster-quality evaluator for the feedback re-cluster front.

Given a MEASURED ray sample exported by RenderConfig.export_rays (an
.npz of (M, 8) row tables [ox oy oz dx dy dz max_t live]), build the
scene's cluster BVH with the surface-area builder (``sah_free``, the
shipped default) and with the ray-weighted builder (``sah_rays``,
trained on the EVEN rows), then score both on the ODD rows (held out)
by the broad-phase proxy the traversal actually pays: the number of
cluster AABBs each ray's slab interval hits within its max_t.  A
cluster visit happens iff the slab hits (closest passes then early-out
by t_best; shadow passes early-out on first hit), so the hit count is
an upper-bound proxy that moves monotonically with kernel time.

Pure numpy — runs on CPU in seconds, no TPU needed.  This is the
go/no-go gate before spending tunnel hours on the on-chip A/B
(benchmarks/feedback_recluster.py).

    python benchmarks/eval_cluster_quality.py --rays /tmp/dragon_rays_cpu.npz \
        [--scene dragon] [--size 1024] [--cluster-size 384]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slab_hits(rays: np.ndarray, lo: np.ndarray, hi: np.ndarray,
              batch: int = 2048) -> np.ndarray:
    """Per-ray count of cluster boxes whose slab interval intersects
    [0, max_t] — the same test as ops.trace_pallas.nearest_cluster."""
    live = rays[:, 7] > 0
    o = rays[live, 0:3].astype(np.float64)
    d = rays[live, 3:6].astype(np.float64)
    inv = 1.0 / np.where(np.abs(d) < 1e-12, np.copysign(1e-12, d), d)
    maxt = rays[live, 6].astype(np.float64)
    counts = np.empty(o.shape[0], np.int64)
    for s in range(0, o.shape[0], batch):
        e = min(s + batch, o.shape[0])
        t0 = (lo[None] - o[s:e, None]) * inv[s:e, None]
        t1 = (hi[None] - o[s:e, None]) * inv[s:e, None]
        tn = np.minimum(t0, t1).max(axis=2)
        tf = np.maximum(t0, t1).min(axis=2)
        counts[s:e] = ((tn <= tf) & (tf >= 0.0)
                       & (tn <= maxt[s:e, None])).sum(axis=1)
    return counts


def cluster_boxes(scene, cluster_size, builder, rays, alpha):
    from metal_raytracing_tpu import scene as S

    v0, e1, e2, *_ = S.flatten_instances(scene.instances)
    from metal_raytracing_tpu import accel

    t0 = time.time()
    order, node_lo, node_hi, spec = accel.build_cluster_bvh(
        v0, e1, e2, cluster_size=cluster_size, builder=builder,
        builder_alpha=alpha, rays=rays)
    lo = node_lo[spec.first_leaf:spec.first_leaf + spec.num_clusters]
    hi = node_hi[spec.first_leaf:spec.first_leaf + spec.num_clusters]
    return lo, hi, spec.num_clusters, time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", required=True)
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--cluster-size", type=int, default=384)
    ap.add_argument("--alpha", type=float, default=2.0)
    ap.add_argument("--ray-min", type=int, default=48)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from metal_raytracing_tpu.scenes import get_scene

    scene = get_scene(args.scene, args.size, args.size)
    z = np.load(args.rays)
    tables = {k: z[k] for k in z.files}
    all_rows = np.concatenate([tables[k] for k in sorted(tables)], axis=0)
    train = all_rows[0::2]
    evals = {k: v[1::2] for k, v in tables.items()}

    out = {"scene": args.scene, "cluster_size": args.cluster_size,
           "train_rows": int((train[:, 7] > 0).sum())}
    for name, builder, rays in (("sah_free", "sah_free", None),
                                ("sah_rays", "sah_rays", train)):
        lo, hi, nc, bt = cluster_boxes(scene, args.cluster_size, builder,
                                       rays, args.alpha)
        res = {"clusters": int(nc), "build_s": round(bt, 2)}
        tot = n = 0
        for k in sorted(evals):
            c = slab_hits(evals[k], lo, hi)
            res[k] = {"mean": round(float(c.mean()), 2),
                      "p90": int(np.percentile(c, 90))}
            tot += int(c.sum())
            n += len(c)
        res["mean_all"] = round(tot / max(n, 1), 3)
        out[name] = res
    out["hit_ratio_rays_over_free"] = round(
        out["sah_rays"]["mean_all"] / max(out["sah_free"]["mean_all"],
                                          1e-9), 4)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
