"""Compiled-Mosaic tracer tests on the real chip: oracle equality across
cluster sizes and streamed/resident triangle planes.

Interpret-mode CI (tests/test_trace_pallas.py) cannot catch Mosaic-only
failures — alignment witnesses and i1 vector restrictions both bit round 1.
This subset compiles trace_closest/trace_any for cluster sizes {128, 384,
512}, VMEM-resident and HBM-streamed, and asserts equality with the
brute-force oracle (SURVEY.md §4 item 3; VERDICT.md round 1 next-step 5).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from metal_raytracing_tpu.ops import trace as T
from metal_raytracing_tpu.ops import trace_pallas as TP
from metal_raytracing_tpu.scenes import plane_sphere_scene


def _rays(n, seed):
    rng = np.random.RandomState(seed)
    o = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    o[:, 1] = np.abs(o[:, 1])
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.fixture(scope="module", params=[
    (128, "sah"), (384, "sah"), (512, "sah"),
    # partially-full clusters (interspersed -1 padding slots) must also
    # survive real Mosaic compilation, not just interpret mode
    (384, "sah_free")])
def built(request):
    csize, builder = request.param
    scene = plane_sphere_scene(32, 32)
    data, spec = scene.build(cluster_size=csize, builder=builder)
    return data, spec


@pytest.mark.parametrize("stream", [False, True])
@pytest.mark.parametrize("flat", [False, True])
def test_closest_matches_oracle_compiled(built, stream, flat):
    data, spec = built
    o, d = _rays(256, seed=11)
    mask = jnp.ones((256,), bool)
    ref = T.trace_closest_bruteforce(o, d, mask, data.geometry)
    got = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                           data.tri_planes, spec.bvh, block=128,
                           stream=stream, flat=flat)
    hits = np.asarray(ref.tri >= 0)
    np.testing.assert_array_equal(np.asarray(got.tri >= 0), hits)
    # source-triangle equality: SBVH pre-split duplicates may win
    # equal-t ties under different slot ids
    src = np.asarray(data.tri_src)
    np.testing.assert_array_equal(src[np.asarray(got.tri)[hits]],
                                  src[np.asarray(ref.tri)[hits]])
    np.testing.assert_allclose(np.asarray(got.t)[hits],
                               np.asarray(ref.t)[hits], rtol=1e-4)


@pytest.mark.parametrize("stream", [False, True])
@pytest.mark.parametrize("flat", [False, True])
def test_any_matches_oracle_compiled(built, stream, flat):
    data, spec = built
    o, d = _rays(256, seed=13)
    mask = jnp.ones((256,), bool)
    max_t = jnp.full((256,), 4.0)
    ref = T.trace_any_bruteforce(o, d, max_t, mask, data.geometry)
    got = TP.trace_any(o, d, max_t, mask, data.sup_planes, data.clu_planes,
                       data.tri_planes, spec.bvh, block=128, stream=stream,
                       flat=flat)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("stream", [False, True])
def test_baked_origin_matches_oracle_compiled(built, stream):
    """The baked-origin primary specialization (4 ray comps, origin-free
    slab/dense forms) on real Mosaic — layout/alignment classes of bug
    that interpret mode cannot catch."""
    data, spec = built
    _, d = _rays(256, seed=19)
    origin = jnp.asarray([0.2, 1.3, 4.0], jnp.float32)
    o = jnp.broadcast_to(origin[None], d.shape)
    mask = jnp.ones((256,), bool)
    ref = T.trace_closest_bruteforce(o, d, mask, data.geometry)
    sup_b, clu_b, tri_b = TP.bake_origin(data.sup_planes, data.clu_planes,
                                         data.tri_planes, origin)
    got = TP.trace_closest(o, d, mask, sup_b, clu_b, tri_b, spec.bvh,
                           block=128, stream=stream, flat=False,
                           baked_origin=True)
    hits = np.asarray(ref.tri >= 0)
    np.testing.assert_array_equal(np.asarray(got.tri >= 0), hits)
    src = np.asarray(data.tri_src)
    np.testing.assert_array_equal(src[np.asarray(got.tri)[hits]],
                                  src[np.asarray(ref.tri)[hits]])
    np.testing.assert_allclose(np.asarray(got.t)[hits],
                               np.asarray(ref.t)[hits], rtol=1e-4)


@pytest.mark.parametrize("stream", [False, True])
def test_pair_visits_compiled(built, stream):
    """pair_visits (two dense tests per inner iteration) on real Mosaic:
    results must be bit-identical to the one-visit walk.  stream=True
    exercises the second _stream_tri DMA into the SAME (16, c_size)
    scratch within one loop iteration — DMA-ordering behavior interpret
    tests cannot catch (ADVICE round 3 #1)."""
    data, spec = built
    o, d = _rays(256, seed=29)
    mask = jnp.ones((256,), bool)
    ref = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                           data.tri_planes, spec.bvh, block=128,
                           flat=False, exact_uv=False, stream=stream)
    got = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                           data.tri_planes, spec.bvh, block=128,
                           flat=False, exact_uv=False, pair_visits=True,
                           stream=stream)
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(got.t))
    np.testing.assert_array_equal(np.asarray(ref.tri), np.asarray(got.tri))
    maxt = jnp.full((256,), 4.0, jnp.float32)
    ra = TP.trace_any(o, d, maxt, mask, data.sup_planes, data.clu_planes,
                      data.tri_planes, spec.bvh, block=128, flat=False,
                      stream=stream)
    ga = TP.trace_any(o, d, maxt, mask, data.sup_planes, data.clu_planes,
                      data.tri_planes, spec.bvh, block=128, flat=False,
                      pair_visits=True, stream=stream)
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(ga))


def test_pair_shared_compiled(built):
    """pair_shared (two clusters through ONE shared accumulator, 10-bit
    in-kernel indices re-packed to the 9-bit key format) on real Mosaic:
    any-hit bit-identical; closest hits agree except near-ties within the
    coarser 2^-13 t chop (see tests/test_trace_pallas.py counterpart).
    Resident path only — under stream=True the flag self-disables."""
    data, spec = built
    o, d = _rays(256, seed=29)
    mask = jnp.ones((256,), bool)
    ref = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                           data.tri_planes, spec.bvh, block=128,
                           flat=False, exact_uv=False, stream=False)
    got = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                           data.tri_planes, spec.bvh, block=128,
                           flat=False, exact_uv=False, pair_shared=True,
                           stream=False)
    rt, gt = np.asarray(ref.t), np.asarray(got.t)
    rtri, gtri = np.asarray(ref.tri), np.asarray(got.tri)
    np.testing.assert_array_equal(rtri >= 0, gtri >= 0)
    found = rtri >= 0
    np.testing.assert_allclose(gt[found], rt[found], rtol=2.5e-4)
    diff = found & (rtri != gtri)
    assert np.all(np.abs(gt[diff] - rt[diff])
                  <= 2.5e-4 * np.abs(rt[diff]) + 1e-7)
    maxt = jnp.full((256,), 4.0, jnp.float32)
    ra = TP.trace_any(o, d, maxt, mask, data.sup_planes, data.clu_planes,
                      data.tri_planes, spec.bvh, block=128, flat=False,
                      stream=False)
    ga = TP.trace_any(o, d, maxt, mask, data.sup_planes, data.clu_planes,
                      data.tri_planes, spec.bvh, block=128, flat=False,
                      pair_shared=True, stream=False)
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(ga))


def test_count_visits_compiled(built):
    data, spec = built
    o, d = _rays(128, seed=17)
    mask = jnp.ones((128,), bool)
    _, vis = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                              data.tri_planes, spec.bvh, block=128,
                              count_visits=True)
    v = np.asarray(vis)
    assert v.shape == (1,)
    assert 0 < v[0] <= spec.bvh.num_clusters


@pytest.mark.parametrize("stream", [False, True])
def test_rank_walk_compiled(built, stream):
    """Rank-directed cluster-major walk (RenderConfig.rank_trace) on real
    Mosaic: walk over broad-phase ranks 1..2 + certificate + seeded
    hierarchical fallback must equal the plain hierarchical kernel.  The
    scalar extract (min over pending rows -> cid), the cid*c_size dynamic
    lane slice with its multiple_of witness, and the per-visit streamed
    DMA are all Mosaic-only surfaces interpret mode cannot validate."""
    data, spec = built
    o, d = _rays(256, seed=37)
    mask = jnp.ones((256,), bool)
    seed_k = TP.global_seed_keys(o, d, mask, data.tri_planes, spec.bvh)
    _, k1, k2, k3 = TP.nearest_cluster(
        o, d, mask, data.clu_planes, spec.bvh, return_key=True,
        return_second=2, return_packed=True)
    key, base = TP.trace_closest_rank(
        o, d, mask, [k1, k2], data.tri_planes, spec.bvh, seed_key=seed_k,
        stream=stream)
    cert = TP.rank_certificate(key, k3)
    fb = TP.trace_closest(o, d, mask & ~cert, data.sup_planes,
                          data.clu_planes, data.tri_planes, spec.bvh,
                          seed_key=key, seed_base=base, exact_uv=False,
                          flat=False, stream=stream)
    unres = np.asarray(mask & ~cert)
    found_r = np.asarray(key < jnp.int32(TP._MISS_KEY))
    tri = np.where(unres, np.asarray(fb.tri),
                   np.where(found_r, np.asarray(base)
                            + (np.asarray(key) & TP.IDX_MASK), -1))
    t = np.where(unres, np.asarray(fb.t), np.asarray(TP._key_to_t(key)))
    ref = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                           data.tri_planes, spec.bvh, seed_key=seed_k,
                           exact_uv=False, flat=False, stream=stream)
    rtri = np.asarray(ref.tri)
    np.testing.assert_array_equal(tri >= 0, rtri >= 0)
    # tie-level divergence only: equal chopped t, different source slot
    src = np.asarray(data.tri_src)
    hits = rtri >= 0
    np.testing.assert_array_equal(src[tri[hits]], src[rtri[hits]])
    np.testing.assert_allclose(t[hits], np.asarray(ref.t)[hits],
                               rtol=1e-4)


@pytest.mark.parametrize("any_mode", [False, True])
def test_broadphase_compiled(built, any_mode):
    """Fused broad-phase kernel on real Mosaic vs the XLA reference
    forms: nearest-cluster packed keys exact; global occlusion exact;
    global-seed winner index exact with t within the Newton tolerance."""
    data, spec = built
    o, d = _rays(512, seed=31)
    mask = jnp.ones((512,), bool)
    ncp = data.clu_planes.shape[0] * data.clu_planes.shape[1]
    if ncp > TP.BROADPHASE_MAX_CLUSTERS:
        pytest.skip("cluster count past the broadphase ceiling")
    if any_mode:
        maxt = jnp.full((512,), 4.0, jnp.float32)
        k1, _, g = TP.broadphase_keys(o, d, mask, data.clu_planes,
                                      data.tri_planes, spec.bvh,
                                      max_t=maxt, any_mode=True, block=128)
        cid_ref = TP.nearest_cluster(o, d, mask, data.clu_planes, spec.bvh,
                                     max_t=maxt)
        occ_ref = TP.global_any_hit(o, d, maxt, mask, data.tri_planes,
                                    spec.bvh)
        cid = TP.decode_cluster_key(k1, ncp)
        # near-tie chop boundaries may flip under fused-multiply-add
        # contraction differences on real hardware — sort-key-only, so
        # tolerate a vanishing fraction
        assert float(np.mean(np.asarray(cid == cid_ref))) > 0.999
        np.testing.assert_array_equal(np.asarray(g > 0), np.asarray(occ_ref))
    else:
        k1, k2, g = TP.broadphase_keys(o, d, mask, data.clu_planes,
                                       data.tri_planes, spec.bvh,
                                       want2=True, block=128)
        cid_ref, key_ref, cid2_ref = TP.nearest_cluster(
            o, d, mask, data.clu_planes, spec.bvh, return_key=True,
            return_second=1)
        cid = TP.decode_cluster_key(k1, ncp)
        cid2 = TP.decode_cluster_key(k2, ncp)
        assert float(np.mean(np.asarray(cid == cid_ref))) > 0.999
        assert float(np.mean(np.asarray(cid2 == cid2_ref))) > 0.999
        gk_ref = TP.global_seed_keys(o, d, mask, data.tri_planes, spec.bvh)
        g_np, ref_np = np.asarray(g), np.asarray(gk_ref)
        miss = g_np == TP._INIT_KEY
        np.testing.assert_array_equal(miss, ref_np == TP._INIT_KEY)
        np.testing.assert_array_equal(g_np[~miss] & TP.IDX_MASK,
                                      ref_np[~miss] & TP.IDX_MASK)
        gt = np.asarray(TP._key_to_t(g))[~miss]
        gt_ref = np.asarray(TP._key_to_t(gk_ref))[~miss]
        np.testing.assert_allclose(gt, gt_ref, rtol=1e-4)
