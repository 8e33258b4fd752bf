"""Block-union simulator: predict the traversal kernel's per-block visit
count for a candidate clustering WITHOUT touching the TPU.

The hierarchical closest kernel pays the UNION of its 128-ray block's
slab-hit candidate sets (ops/trace_pallas.py), so per-ray hit counts
(benchmarks/eval_cluster_quality.py) under-measure what a clustering
change does to kernel time: dragon telemetry shows per-ray hits ~1.2 but
block-level visit means ~5.  This harness replays the EXACT bounce
compaction pipeline on CPU — the cluster2 sort key assembly from
renderer.bounce_sort (rank-1/rank-2 nearest cluster, global-seed miss
fold, direction cone, origin Morton) — over a measured ray sample
(RenderConfig.export_rays, stride 1), blocks the sorted rays by 128, and
counts each block's distinct slab-hit clusters.  The mean over non-empty
blocks is an upper-bound proxy for kernel visits (no t_best early-out),
comparable ACROSS clusterings.

    python benchmarks/block_union_sim.py --rays /tmp/dragon_rays_s1.npz \
        --train /tmp/dragon_rays_cpu.npz [--scene dragon] [--size 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def block_unions(o, d, alive, data, spec, cfg, block=128):
    """Mean distinct slab-hit clusters per 128-ray block after the real
    cluster2 compaction sort (renderer.bounce_sort key layout)."""
    import jax
    import jax.numpy as jnp

    from metal_raytracing_tpu import renderer as R
    from metal_raytracing_tpu.ops import trace_pallas as tp

    o_j = jnp.asarray(o)
    d_j = jnp.asarray(d)
    alive_j = jnp.asarray(alive)
    nc_tot = data.clu_planes.shape[0] * data.clu_planes.shape[1]

    @jax.jit
    def keys():
        cid, nckey, cid2 = tp.nearest_cluster(
            o_j, d_j, alive_j, data.clu_planes, spec.bvh,
            return_key=True, return_second=1)
        if cfg.cluster_miss_fold and spec.bvh.num_global > 0:
            gk = tp.global_seed_keys(o_j, d_j, alive_j, data.tri_planes,
                                     spec.bvh)
            tn_f = jax.lax.bitcast_convert_type(
                nckey & ~jnp.int32((1 << 12) - 1), jnp.float32)
            g_plus = jax.lax.bitcast_convert_type(
                (gk & ~jnp.int32(tp.IDX_MASK)) + jnp.int32(1 << 9),
                jnp.float32)
            beats = (gk < jnp.int32(tp._MISS_KEY)) & (tn_f >= g_plus)
            cid_f = jnp.where(beats, jnp.int32(nc_tot), cid)
        else:
            cid_f = cid
        cbits = max(1, int(nc_tot).bit_length())
        db = 2
        avail = 30 - cbits - 3 * db
        c2bits = min(cbits, max(0, avail))
        mbits = max(0, avail - c2bits)
        m = R._morton_512(o_j, data)
        shift = 30 - cbits
        key = cid_f << shift
        if c2bits:
            shift -= c2bits
            key = key | ((cid2 & ((1 << c2bits) - 1)) << shift)
        lvl = 1 << (db - 1)
        q = jnp.clip(((d_j + 1.0) * lvl).astype(jnp.int32), 0, 2 * lvl - 1)
        dirq = (q[:, 0] << (2 * db)) | (q[:, 1] << db) | q[:, 2]
        shift -= 3 * db
        key = key | (dirq << shift)
        key = key | (m >> max(0, 27 - mbits))
        return key, cid_f

    key, cid_f = (np.asarray(x) for x in keys())
    order = np.argsort(key, kind="stable")
    o_s, d_s = o[order], d[order]
    # folded (cid == NC) and dead rays skip the kernel entirely
    active = (alive & (cid_f != nc_tot))[order]

    boxes = np.asarray(data.clu_planes).reshape(nc_tot, 6).astype(np.float64)
    inv = 1.0 / np.where(np.abs(d_s) < 1e-12, np.copysign(1e-12, d_s), d_s)
    unions = []
    per_ray = []
    for s in range(0, o_s.shape[0], block):
        e = min(s + block, o_s.shape[0])
        t0 = (boxes[None, :, 0:3] - o_s[s:e, None]) * inv[s:e, None]
        t1 = (boxes[None, :, 3:6] - o_s[s:e, None]) * inv[s:e, None]
        tn = np.minimum(t0, t1).max(axis=2)
        tf = np.maximum(t0, t1).min(axis=2)
        hit = (tn <= tf) & (tf >= 0.0) & active[s:e, None]
        u = int(hit.any(axis=0).sum())
        if active[s:e].any():
            unions.append(u)
            per_ray.append(float(hit.sum(axis=1)[active[s:e]].mean()))
    return (float(np.mean(unions)), float(np.percentile(unions, 90)),
            float(np.mean(per_ray)), len(unions))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", required=True,
                    help="stride-1 export (block population)")
    ap.add_argument("--train", required=True,
                    help="strided export (sah_rays training sample)")
    ap.add_argument("--scene", default="dragon")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--cluster-size", type=int, default=384)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from metal_raytracing_tpu.scenes import get_scene
    from metal_raytracing_tpu.types import RenderConfig

    cfg = RenderConfig(width=args.size, height=args.size, max_bounces=3,
                       tracer="pallas")
    scene = get_scene(args.scene, args.size, args.size)
    zt = np.load(args.train)
    train = np.concatenate([zt[k] for k in sorted(zt.files)], axis=0)
    z = np.load(args.rays)

    out = {"scene": args.scene}
    for bname, rays in (("sah_free", None), ("sah_rays", train)):
        data, spec = scene.build(cluster_size=args.cluster_size,
                                 builder=bname if rays is None
                                 else "sah_rays", rays=rays)
        res = {"clusters": int(spec.bvh.num_clusters)}
        for k in sorted(z.files):
            if not k.startswith("rays_b") or k == "rays_b0":
                continue  # primary rays keep camera order (no sort)
            t = z[k]
            u_mean, u_p90, pr, nb = block_unions(
                t[:, 0:3].astype(np.float32),
                t[:, 3:6].astype(np.float32),
                t[:, 7] > 0, data, spec, cfg)
            res[k] = {"union_mean": round(u_mean, 2),
                      "union_p90": round(u_p90, 1),
                      "per_ray": round(pr, 2), "blocks": nb}
        out[bname] = res
    b1r = (out["sah_rays"]["rays_b1"]["union_mean"]
           / max(out["sah_free"]["rays_b1"]["union_mean"], 1e-9))
    out["b1_union_ratio_rays_over_free"] = round(b1r, 4)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
