"""Intersection + BVH traversal tests (SURVEY.md §4 item 3): primitives on
hand-built cases, invariants on the built tree, and packet traversal equal to
the brute-force oracle on real scenes and random ray sets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_raytracing_tpu import accel
from metal_raytracing_tpu.ops import trace as T
from metal_raytracing_tpu.ops.intersect import (
    BIG_T, moller_trumbore, ray_aabb, safe_inverse)
from metal_raytracing_tpu.scene import build_scene_data
from metal_raytracing_tpu.scenes import plane_sphere_scene


def test_moller_trumbore_basics():
    v0 = jnp.asarray([[0.0, 0.0, 0.0]])
    e1 = jnp.asarray([[1.0, 0.0, 0.0]])
    e2 = jnp.asarray([[0.0, 1.0, 0.0]])
    o = jnp.asarray([[0.25, 0.25, 1.0], [0.9, 0.9, 1.0], [0.25, 0.25, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]] * 3)
    t, u, v, hit = moller_trumbore(o, d, v0, e1, e2)
    assert bool(hit[0]) and not bool(hit[1])  # u+v > 1 misses
    assert float(t[0]) == pytest.approx(1.0)
    assert float(u[0]) == pytest.approx(0.25)
    assert float(v[0]) == pytest.approx(0.25)
    # double-sided: flip direction and origin below the plane
    t2, _, _, hit2 = moller_trumbore(
        jnp.asarray([[0.25, 0.25, -1.0]]), jnp.asarray([[0.0, 0.0, 1.0]]),
        v0, e1, e2)
    assert bool(hit2[0]) and float(t2[0]) == pytest.approx(1.0)


def test_moller_trumbore_degenerate_never_hits():
    z = jnp.zeros((1, 3))
    o = jnp.asarray([[0.0, 0.0, 1.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    *_, hit = moller_trumbore(o, d, z, z, z)
    assert not bool(hit[0])


def test_ray_aabb():
    o = jnp.asarray([[0.0, 0.0, 5.0]])
    inv = safe_inverse(jnp.asarray([[0.0, 0.0, -1.0]]))
    lo = jnp.asarray([[-1.0, -1.0, -1.0]])
    hi = jnp.asarray([[1.0, 1.0, 1.0]])
    tn, hit = ray_aabb(o, inv, lo, hi, t_max=jnp.asarray([BIG_T]))
    assert bool(hit[0]) and float(tn[0]) == pytest.approx(4.0)
    # ray starting inside
    tn2, hit2 = ray_aabb(jnp.zeros((1, 3)), inv, lo, hi,
                         t_max=jnp.asarray([BIG_T]))
    assert bool(hit2[0]) and float(tn2[0]) <= 0.0
    # behind the ray
    _, hit3 = ray_aabb(o, safe_inverse(jnp.asarray([[0.0, 0.0, 1.0]])),
                       lo, hi, t_max=jnp.asarray([BIG_T]))
    assert not bool(hit3[0])


def test_ray_aabb_rejects_empty_sentinel():
    """Padding leaves use [inf, -inf] boxes; a naive slab test accepts them."""
    o = jnp.zeros((1, 3))
    inv = safe_inverse(jnp.asarray([[0.0, 0.0, -1.0]]))
    lo = jnp.full((1, 3), jnp.inf)
    hi = jnp.full((1, 3), -jnp.inf)
    _, hit = ray_aabb(o, inv, lo, hi, t_max=jnp.asarray([BIG_T]))
    assert not bool(hit[0])


def _random_soup(n=1000, seed=0):
    rng = np.random.RandomState(seed)
    v0 = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    e1 = rng.uniform(-0.3, 0.3, size=(n, 3)).astype(np.float32)
    e2 = rng.uniform(-0.3, 0.3, size=(n, 3)).astype(np.float32)
    return v0, e1, e2


@pytest.mark.parametrize("branching,cluster,builder", [
    (2, 16, "sah"), (8, 64, "sah"), (4, 32, "sah"),
    (8, 64, "sah_free"), (4, 32, "sah_free"),
    (8, 64, "ploc"), (4, 32, "ploc")])
def test_bvh_invariants(branching, cluster, builder):
    v0, e1, e2 = _random_soup(777)
    order, node_lo, node_hi, spec = accel.build_cluster_bvh(
        v0, e1, e2, cluster_size=cluster, branching=branching,
        builder=builder)
    # every real triangle appears exactly once (clustered or global slots)
    real = order[order >= 0]
    assert sorted(real.tolist()) == list(range(777))
    assert spec.padded_triangles == len(order)
    # parent AABB contains children (heap order: children of g are g*B+1..+B)
    b = spec.branching
    for g in range(spec.first_leaf):
        c0 = g * b + 1
        child_lo = node_lo[c0:c0 + b]
        child_hi = node_hi[c0:c0 + b]
        valid = child_hi[:, 0] >= child_lo[:, 0]
        if valid.any():
            assert (node_lo[g] <= child_lo[valid].min(axis=0) + 1e-6).all()
            assert (node_hi[g] >= child_hi[valid].max(axis=0) - 1e-6).all()
    # triangles inside their leaf AABB (clustered slots only: global slots
    # live past the clusters and have no leaf box by design)
    nclustered = spec.num_clusters * spec.cluster_size
    corder = order[:nclustered]
    p0 = np.zeros((nclustered, 3), np.float32)
    p0[corder >= 0] = v0[corder[corder >= 0]]
    leaf_of = np.arange(nclustered) // spec.cluster_size
    lo = node_lo[spec.first_leaf + leaf_of]
    hi = node_hi[spec.first_leaf + leaf_of]
    mask = (corder >= 0)
    assert (p0[mask] >= lo[mask] - 1e-5).all()
    assert (p0[mask] <= hi[mask] + 1e-5).all()


def test_global_set_extraction():
    """Huge triangles go to dedicated global slots past the clusters
    (BVHSpec.num_global): excluded from clustering, 128-aligned, and the
    union of clustered + global slots still covers every source exactly
    once."""
    v0, e1, e2 = _random_soup(500, seed=31)
    e1[:3] *= 50.0  # scene-spanning triangles
    e2[:3] *= 50.0
    order, node_lo, node_hi, spec = accel.build_cluster_bvh(
        v0, e1, e2, cluster_size=64, branching=8)
    assert spec.num_global >= 3
    assert spec.padded_global % 128 == 0
    assert spec.global_base == spec.num_clusters * spec.cluster_size
    assert spec.padded_triangles == spec.global_base + spec.padded_global
    gslots = order[spec.global_base:]
    assert set(range(3)) <= set(gslots[gslots >= 0].tolist())
    real = order[order >= 0]
    assert sorted(real.tolist()) == list(range(500))
    # the huge triangles are NOT in any cluster -> every leaf box is much
    # smaller than the (inflated) scene box
    ext = np.maximum(node_hi - node_lo, 0)[spec.first_leaf:]
    sa = ext[:, 0] * ext[:, 1] + ext[:, 1] * ext[:, 2] + ext[:, 2] * ext[:, 0]
    lo_all = np.minimum(np.minimum(v0, v0 + e1), v0 + e2).min(axis=0)
    hi_all = np.maximum(np.maximum(v0, v0 + e1), v0 + e2).max(axis=0)
    sext = hi_all - lo_all
    scene_sa = sext[0] * sext[1] + sext[1] * sext[2] + sext[2] * sext[0]
    assert sa.max() < 0.5 * scene_sa


def test_presplit_reference_coverage():
    """SBVH pre-split invariants (accel.presplit_references): every source
    triangle keeps FULL surface coverage by the union of its reference
    boxes (traversal correctness depends on exactly this), every source
    appears at least once, and oversized triangles actually split."""
    v0, e1, e2 = _random_soup(200, seed=21)
    e1[:5] *= 20.0  # oversized triangles: the splitter's targets
    e2[:5] *= 20.0
    p0 = v0.astype(np.float64)
    p1, p2 = p0 + e1, p0 + e2
    tri_lo = np.minimum(np.minimum(p0, p1), p2)
    tri_hi = np.maximum(np.maximum(p0, p1), p2)
    src, ref_lo, ref_hi = accel.presplit_references(
        p0, e1.astype(np.float64), e2.astype(np.float64), tri_lo, tri_hi,
        budget_frac=0.5)
    counts = np.bincount(src, minlength=200)
    assert (counts >= 1).all()
    assert counts[:5].sum() > 5, "oversized triangles were not split"

    # surface coverage: a barycentric grid on each SPLIT triangle must lie
    # inside at least one of its reference boxes
    grid = [(a / 8.0, b / 8.0) for a in range(9) for b in range(9 - a)]
    for s in np.nonzero(counts > 1)[0][:10]:
        boxes = np.nonzero(src == s)[0]
        for a, b in grid:
            p = p0[s] + a * e1[s] + b * e2[s]
            inside = ((ref_lo[boxes] - 1e-6 <= p) &
                      (p <= ref_hi[boxes] + 1e-6)).all(axis=1)
            assert inside.any(), (s, a, b)

    # and the full build with presplit keeps every source reachable
    order, node_lo, node_hi, spec = accel.build_cluster_bvh(
        v0, e1, e2, cluster_size=32, branching=8, presplit=0.5)
    assert np.array_equal(np.unique(order[order >= 0]), np.arange(200))


def _scene_geom(cluster=64, branching=8):
    scene = plane_sphere_scene(32, 32)
    data, spec = scene.build(cluster_size=cluster, branching=branching)
    return data, spec


def _random_rays(n, seed=1):
    rng = np.random.RandomState(seed)
    o = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    o[:, 1] = np.abs(o[:, 1])  # above ground to make hits likely
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("cluster,branching", [(64, 8), (32, 2)])
def test_packet_matches_bruteforce_closest(cluster, branching):
    data, spec = _scene_geom(cluster, branching)
    o, d = _random_rays(512)
    mask = jnp.ones((512,), bool)
    ref = jax.jit(lambda o, d: T.trace_closest_bruteforce(
        o, d, mask, data.geometry))(o, d)
    got = jax.jit(lambda o, d: T.trace_closest(
        o, d, mask, data.geometry, data.node_lo, data.node_hi, spec.bvh,
        block=128))(o, d)
    np.testing.assert_array_equal(np.asarray(got.tri >= 0),
                                  np.asarray(ref.tri >= 0))
    hits = np.asarray(ref.tri >= 0)
    np.testing.assert_allclose(np.asarray(got.t)[hits],
                               np.asarray(ref.t)[hits], rtol=1e-5)
    # Slot ids may differ between tracers where the SBVH pre-split
    # duplicated a triangle (equal-t ties across duplicate references);
    # the SOURCE triangle must agree.
    src = np.asarray(data.tri_src)
    np.testing.assert_array_equal(src[np.asarray(got.tri)[hits]],
                                  src[np.asarray(ref.tri)[hits]])


import pytest as _pytest


@_pytest.mark.parametrize("builder", ["sah_free", "ploc"])
def test_sah_free_packet_matches_bruteforce(builder):
    """Partially-full-cluster builders (sah_free top-down, ploc bottom-up)
    must trace identically to the oracle: interspersed -1 padding slots
    become degenerate triangles and cluster boxes still bound their
    refs."""
    scene = plane_sphere_scene(32, 32)
    data, spec = scene.build(cluster_size=64, branching=8,
                             builder=builder)
    o, d = _random_rays(512)
    mask = jnp.ones((512,), bool)
    ref = jax.jit(lambda o, d: T.trace_closest_bruteforce(
        o, d, mask, data.geometry))(o, d)
    got = jax.jit(lambda o, d: T.trace_closest(
        o, d, mask, data.geometry, data.node_lo, data.node_hi, spec.bvh,
        block=128))(o, d)
    np.testing.assert_array_equal(np.asarray(got.tri >= 0),
                                  np.asarray(ref.tri >= 0))
    hits = np.asarray(ref.tri >= 0)
    np.testing.assert_allclose(np.asarray(got.t)[hits],
                               np.asarray(ref.t)[hits], rtol=1e-5)
    src = np.asarray(data.tri_src)
    np.testing.assert_array_equal(src[np.asarray(got.tri)[hits]],
                                  src[np.asarray(ref.tri)[hits]])


def test_packet_matches_bruteforce_any():
    data, spec = _scene_geom()
    o, d = _random_rays(512, seed=3)
    mask = jnp.ones((512,), bool)
    max_t = jnp.full((512,), 4.0)
    ref = jax.jit(lambda o, d: T.trace_any_bruteforce(
        o, d, max_t, mask, data.geometry))(o, d)
    got = jax.jit(lambda o, d: T.trace_any(
        o, d, max_t, mask, data.geometry, data.node_lo, data.node_hi,
        spec.bvh, block=128))(o, d)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_masked_rays_never_hit():
    data, spec = _scene_geom()
    o, d = _random_rays(256, seed=5)
    mask = jnp.zeros((256,), bool)
    got = T.trace_closest(o, d, mask, data.geometry, data.node_lo,
                          data.node_hi, spec.bvh, block=128)
    assert (np.asarray(got.tri) == -1).all()


def test_single_cluster_scene():
    """Tiny scene where the BVH root is the only leaf (levels == 0)."""
    v0, e1, e2 = _random_soup(10, seed=9)
    order, node_lo, node_hi, spec = accel.build_cluster_bvh(
        v0, e1, e2, cluster_size=16, branching=8)
    assert spec.levels == 0 and spec.first_leaf == 0
    from metal_raytracing_tpu.scene import GeometryTable

    def permute(a):
        out = np.zeros((spec.padded_triangles, 3), np.float32)
        out[order >= 0] = a[order[order >= 0]]
        return jnp.asarray(out)

    geom = GeometryTable(
        v0=permute(v0), e1=permute(e1), e2=permute(e2),
        n0=permute(v0), n1=permute(v0), n2=permute(v0),
        material_id=jnp.zeros((spec.padded_triangles,), jnp.int32))
    o, d = _random_rays(128, seed=11)
    mask = jnp.ones((128,), bool)
    ref = T.trace_closest_bruteforce(o, d, mask, geom)
    got = T.trace_closest(o, d, mask, geom, jnp.asarray(node_lo),
                          jnp.asarray(node_hi), spec, block=128)
    np.testing.assert_array_equal(np.asarray(got.tri), np.asarray(ref.tri))
