"""Pallas two-phase tracer vs brute-force oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metal_raytracing_tpu.ops import trace as T
from metal_raytracing_tpu.ops import trace_pallas as TP
from metal_raytracing_tpu.scenes import plane_sphere_scene


@pytest.fixture(scope="module")
def scene_data():
    scene = plane_sphere_scene(32, 32)
    return scene.build(cluster_size=128)


def _rays(n, seed=1):
    rng = np.random.RandomState(seed)
    o = rng.uniform(-3, 3, size=(n, 3)).astype(np.float32)
    o[:, 1] = np.abs(o[:, 1])
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


@pytest.mark.parametrize("flat", [True, False])
def test_pallas_closest_matches_oracle(scene_data, flat):
    """Both the flat single-level and the hierarchical two-level kernels
    must match the brute-force oracle (the auto threshold would otherwise
    leave one of them uncovered on small test scenes)."""
    data, spec = scene_data
    o, d = _rays(256)
    mask = jnp.ones((256,), bool)
    ref = T.trace_closest_bruteforce(o, d, mask, data.geometry)
    got = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                           data.tri_planes, spec.bvh, block=128, flat=flat)
    hits = np.asarray(ref.tri >= 0)
    np.testing.assert_array_equal(np.asarray(got.tri >= 0), hits)
    # map slots -> source triangles: SBVH pre-split duplicates can win
    # equal-t ties under different slot ids (identical geometry/shading)
    src = np.asarray(data.tri_src)
    np.testing.assert_array_equal(src[np.asarray(got.tri)[hits]],
                                  src[np.asarray(ref.tri)[hits]])
    np.testing.assert_allclose(np.asarray(got.t)[hits],
                               np.asarray(ref.t)[hits], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.u)[hits],
                               np.asarray(ref.u)[hits], atol=1e-5)


@pytest.mark.parametrize("flat", [True, False])
def test_pallas_any_matches_oracle(scene_data, flat):
    data, spec = scene_data
    o, d = _rays(256, seed=3)
    mask = jnp.ones((256,), bool)
    max_t = jnp.full((256,), 4.0)
    ref = T.trace_any_bruteforce(o, d, max_t, mask, data.geometry)
    got = TP.trace_any(o, d, max_t, mask, data.sup_planes, data.clu_planes,
                       data.tri_planes, spec.bvh, block=128, flat=flat)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_masked_rays(scene_data):
    data, spec = scene_data
    o, d = _rays(128, seed=5)
    mask = jnp.zeros((128,), bool)
    got = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                           data.tri_planes, spec.bvh, block=128)
    assert (np.asarray(got.tri) == -1).all()


def test_pallas_rejects_unaligned_cluster_size():
    """cluster_size must be a 128-multiple: the kernels declare
    pl.multiple_of(base, 128) alignment witnesses, which would be silently
    FALSE on real TPU otherwise (ADVICE.md round 1, high)."""
    scene = plane_sphere_scene(32, 32)
    data, spec = scene.build(cluster_size=64)
    o, d = _rays(128)
    mask = jnp.ones((128,), bool)
    with pytest.raises(ValueError, match="128"):
        TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                         data.tri_planes, spec.bvh, block=128)
    with pytest.raises(ValueError, match="128"):
        TP.trace_any(o, d, jnp.full((128,), 4.0), mask, data.sup_planes,
                     data.clu_planes, data.tri_planes, spec.bvh, block=128)


def test_pallas_renderer_image(scene_data):
    from metal_raytracing_tpu.renderer import Renderer
    from metal_raytracing_tpu.scenes import plane_sphere_scene
    from metal_raytracing_tpu.types import RenderConfig
    from metal_raytracing_tpu.io.image import rmse

    scene = plane_sphere_scene(32, 32)
    cfg_ref = RenderConfig(width=32, height=32, max_bounces=2,
                           tracer="bruteforce", ray_block=128)
    cfg_pal = RenderConfig(width=32, height=32, max_bounces=2,
                           tracer="pallas", ray_block=128)
    ref = Renderer(scene, cfg_ref).render(1)
    got = Renderer(scene, cfg_pal).render(1)
    # The pallas kernel returns a chopped t (low mantissa bits carry the
    # triangle index) but the renderer recomputes the EXACT hit distance
    # from the winning triangle's plane row — residual error is only the
    # winner selection on 512-ulp t ties.
    assert rmse(ref, got) < 5e-5


@pytest.mark.parametrize("key", ["cluster1", "cluster1_dir9", "cluster2",
                                 "cluster1_hit", "cluster2_nodir",
                                 "cluster3"])
def test_pallas_cluster1_sort_key_is_pure_permutation(key):
    """The cluster1 bounce keys (nearest-cluster broad phase; _dir9 = 512
    secondary direction cones) reorder traversal blocks only — same image
    as the default dir6 key on the pallas tracer (tolerance for 512-ulp
    t-tie winner flips, as in
    tests/test_renderer.py::test_sort_keys_are_pure_permutations)."""
    from metal_raytracing_tpu.renderer import Renderer
    from metal_raytracing_tpu.scenes import plane_sphere_scene
    from metal_raytracing_tpu.types import RenderConfig
    from metal_raytracing_tpu.io.image import rmse

    scene = plane_sphere_scene(32, 32)
    cfg_ref = RenderConfig(width=32, height=32, max_bounces=3,
                           tracer="pallas", ray_block=128)
    cfg_c1 = RenderConfig(width=32, height=32, max_bounces=3,
                          tracer="pallas", ray_block=128,
                          sort_key=key)
    ref = Renderer(scene, cfg_ref).render(1)
    got = Renderer(scene, cfg_c1).render(1)
    assert rmse(ref, got) < 1e-7


def test_pallas_component_tuple_rays_match_stacked(scene_data):
    """trace_closest/trace_any accept o/d as 3-tuples of (N,) component
    arrays (what the compaction sort emits) — results must be identical
    to the stacked (N, 3) form."""
    import numpy as np

    from metal_raytracing_tpu.ops import trace_pallas as TP

    data, spec = scene_data
    o, d = _rays(256, seed=11)
    mask = jnp.ones((256,), bool)
    ot = (o[:, 0], o[:, 1], o[:, 2])
    dt = (d[:, 0], d[:, 1], d[:, 2])
    for exact_uv in (False, True):
        h_a = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                               data.tri_planes, spec.bvh, exact_uv=exact_uv)
        h_b = TP.trace_closest(ot, dt, mask, data.sup_planes,
                               data.clu_planes, data.tri_planes, spec.bvh,
                               exact_uv=exact_uv)
        np.testing.assert_array_equal(np.asarray(h_a.t), np.asarray(h_b.t))
        np.testing.assert_array_equal(np.asarray(h_a.tri),
                                      np.asarray(h_b.tri))
    maxt = jnp.full((256,), 3.0, jnp.float32)
    occ_a = TP.trace_any(o, d, maxt, mask, data.sup_planes, data.clu_planes,
                         data.tri_planes, spec.bvh)
    occ_b = TP.trace_any(ot, dt, maxt, mask, data.sup_planes,
                         data.clu_planes, data.tri_planes, spec.bvh)
    np.testing.assert_array_equal(np.asarray(occ_a), np.asarray(occ_b))


def test_pallas_cluster1_many_lights_no_leak():
    """The cluster1 SHADOW key packs (cluster id, light index, Morton);
    with >= 8 lights the light field widens and must not push the key
    into the 2**30 dead sentinel or truncate cluster bits (the analog of
    tests/test_renderer.py::test_shadow_sort_many_lights_no_leak)."""
    import numpy as np

    from metal_raytracing_tpu.renderer import Renderer
    from metal_raytracing_tpu.scenes import plane_sphere_scene
    from metal_raytracing_tpu.types import RenderConfig, area_light
    from metal_raytracing_tpu.io.image import rmse

    def scene_with_lights():
        s = plane_sphere_scene(24, 24)
        for i in range(8):  # 10 lights total, indices > 7
            a = 2.0 * np.pi * i / 8.0
            s.lights.append(area_light(
                position=(1.5 * np.cos(a), 1.9, 1.5 * np.sin(a)),
                forward=(0.0, -1.0, 0.0), right=(0.1, 0.0, 0.0),
                up=(0.0, 0.0, 0.1), color=(2.0, 2.0, 2.0)))
        return s

    base = RenderConfig(width=24, height=24, max_bounces=2, tracer="pallas",
                        ray_block=128)
    import dataclasses

    c1 = dataclasses.replace(base, sort_key="cluster1")
    ref = Renderer(scene_with_lights(), base).render(1)
    got = Renderer(scene_with_lights(), c1).render(1)
    assert rmse(ref, got) < 1e-7


def test_pallas_pair_visits_bit_identical(scene_data):
    """pair_visits dense-tests TWO clusters per inner iteration; the
    packed-key min is order-independent and over-visiting can only waste
    work, so (t, tri) must be BIT-identical to the one-visit walk."""
    data, spec = scene_data
    o, d = _rays(256, seed=23)
    mask = jnp.ones((256,), bool)
    ref = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                           data.tri_planes, spec.bvh, flat=False,
                           exact_uv=False)
    got = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                           data.tri_planes, spec.bvh, flat=False,
                           exact_uv=False, pair_visits=True)
    np.testing.assert_array_equal(np.asarray(ref.t), np.asarray(got.t))
    np.testing.assert_array_equal(np.asarray(ref.tri), np.asarray(got.tri))
    maxt = jnp.full((256,), 4.0, jnp.float32)
    ra = TP.trace_any(o, d, maxt, mask, data.sup_planes, data.clu_planes,
                      data.tri_planes, spec.bvh, flat=False)
    ga = TP.trace_any(o, d, maxt, mask, data.sup_planes, data.clu_planes,
                      data.tri_planes, spec.bvh, flat=False,
                      pair_visits=True)
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(ga))


def test_pallas_pair_shared_matches(scene_data):
    """pair_shared folds two clusters' dense chunks into ONE shared
    accumulator with 10-bit in-kernel indices: any-hit is BIT-identical
    (order-independent mask); closest-hit t chops one bit coarser
    (2^-13 relative), so hits must agree exactly except near-ties within
    that chop, where either winner is a valid closest hit."""
    data, spec = scene_data
    o, d = _rays(256, seed=23)
    mask = jnp.ones((256,), bool)
    ref = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                           data.tri_planes, spec.bvh, flat=False,
                           exact_uv=False)
    got = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                           data.tri_planes, spec.bvh, flat=False,
                           exact_uv=False, pair_shared=True)
    rt, gt = np.asarray(ref.t), np.asarray(got.t)
    rtri, gtri = np.asarray(ref.tri), np.asarray(got.tri)
    np.testing.assert_array_equal(rtri >= 0, gtri >= 0)
    found = rtri >= 0
    # t agrees to the coarser chop everywhere
    np.testing.assert_allclose(gt[found], rt[found], rtol=2.5e-4)
    # the winning triangle may differ ONLY where the two tracers' t are
    # within the 10-bit chop of each other (a true near-tie)
    diff = found & (rtri != gtri)
    assert np.all(np.abs(gt[diff] - rt[diff])
                  <= 2.5e-4 * np.abs(rt[diff]) + 1e-7)
    maxt = jnp.full((256,), 4.0, jnp.float32)
    ra = TP.trace_any(o, d, maxt, mask, data.sup_planes, data.clu_planes,
                      data.tri_planes, spec.bvh, flat=False)
    ga = TP.trace_any(o, d, maxt, mask, data.sup_planes, data.clu_planes,
                      data.tri_planes, spec.bvh, flat=False,
                      pair_shared=True)
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(ga))


def test_pallas_baked_origin_matches_unbaked(scene_data):
    """Shared-origin rays traced against bake_origin()-shifted planes
    (the primary-pass specialization) must match the plain kernel: t is
    bit-identical (the baked d_const keeps the kernel's n.o product
    order) and u/v only re-associate (hit-point form -> direction form,
    ~1 ulp).  Exercises the in-kernel chunk global seed with ocol=None
    when the scene has a global set."""
    data, spec = scene_data
    _, d = _rays(256, seed=7)
    origin = jnp.asarray([0.25, 1.4, 4.1], jnp.float32)
    o = jnp.broadcast_to(origin[None], d.shape)
    mask = jnp.ones((256,), bool)
    ref = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                           data.tri_planes, spec.bvh, flat=False)
    sup_b, clu_b, tri_b = TP.bake_origin(data.sup_planes, data.clu_planes,
                                         data.tri_planes, origin)
    got = TP.trace_closest(o, d, mask, sup_b, clu_b, tri_b, spec.bvh,
                           flat=False, baked_origin=True)
    hits = np.asarray(ref.tri >= 0)
    np.testing.assert_array_equal(np.asarray(got.tri >= 0), hits)
    src = np.asarray(data.tri_src)
    np.testing.assert_array_equal(src[np.asarray(got.tri)[hits]],
                                  src[np.asarray(ref.tri)[hits]])
    np.testing.assert_allclose(np.asarray(got.t)[hits],
                               np.asarray(ref.t)[hits], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got.u)[hits],
                               np.asarray(ref.u)[hits], atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.v)[hits],
                               np.asarray(ref.v)[hits], atol=1e-5)


@pytest.mark.parametrize("knob", [dict(shadow_hit_key=True),
                                  dict(shadow_key2=True),
                                  dict(shadow_hit_key_from=1),
                                  dict(bounce_hit_key_from=1),
                                  dict(shadow_hit_key_from=2,
                                       bounce_hit_key_from=2)])
def test_pallas_shadow_key_variants_are_pure_permutations(knob):
    """shadow_hit_key (hit-cluster proxy + conservative super-level fold)
    and shadow_key2 (second-nearest id below the first) only reorder /
    skip-when-proven-clear occlusion queries — the image must match.
    The *_from thresholds restrict the proxy to late bounces (exact keys
    where populations are large, free keys where they've collapsed) and
    must equally be pure permutations."""
    import dataclasses

    from metal_raytracing_tpu.renderer import Renderer
    from metal_raytracing_tpu.scenes import plane_sphere_scene
    from metal_raytracing_tpu.types import RenderConfig
    from metal_raytracing_tpu.io.image import rmse

    base = RenderConfig(width=32, height=32, max_bounces=3,
                        tracer="pallas", ray_block=128,
                        sort_key="cluster1")
    hk = dataclasses.replace(base, **knob)
    ref = Renderer(plane_sphere_scene(32, 32), base).render(1)
    got = Renderer(plane_sphere_scene(32, 32), hk).render(1)
    assert rmse(ref, got) < 1e-7


def test_renderer_bake_primary_parity(monkeypatch):
    """bake_primary changes only the primary pass's arithmetic
    association — the rendered image must match the unbaked render to
    float-reassociation tolerance.  FLAT_MAX_CLUSTERS is pinned to 0 so
    the small test scene takes the hierarchical kernel the bake
    requires."""
    import dataclasses

    from metal_raytracing_tpu.renderer import Renderer
    from metal_raytracing_tpu.scenes import plane_sphere_scene
    from metal_raytracing_tpu.types import RenderConfig
    from metal_raytracing_tpu.io.image import rmse

    monkeypatch.setattr(TP, "FLAT_MAX_CLUSTERS", 0)
    base = RenderConfig(width=32, height=32, max_bounces=2,
                        tracer="pallas", ray_block=128)
    b = dataclasses.replace(base, bake_primary=True)
    ref = Renderer(plane_sphere_scene(32, 32), base).render(1)
    got = Renderer(plane_sphere_scene(32, 32), b).render(1)
    assert rmse(ref, got) < 1e-3


def test_nearest_cluster_broad_phase(scene_data):
    """nearest_cluster returns the id of the slab-hit cluster with the
    smallest entry distance (oracle: per-ray numpy slab over all boxes)."""
    import numpy as np

    from metal_raytracing_tpu.ops import trace_pallas as TP

    data, spec = scene_data
    o, d = _rays(128, seed=3)
    mask = jnp.ones((128,), bool)
    got = np.asarray(TP.nearest_cluster(o, d, mask, data.clu_planes,
                                        spec.bvh))
    boxes = np.asarray(data.clu_planes).reshape(-1, 6)
    on, dn = np.asarray(o), np.asarray(d)
    nc = boxes.shape[0]
    def entry_t(i, c):
        lo, hi = boxes[c, 0:3], boxes[c, 3:6]
        if not (hi[0] >= lo[0]):
            return None  # empty padding box
        inv = 1.0 / np.where(np.abs(dn[i]) < 1e-12,
                             np.where(dn[i] < 0, -1e-12, 1e-12), dn[i])
        t0 = (lo - on[i]) * inv
        t1 = (hi - on[i]) * inv
        tn = np.max(np.minimum(t0, t1))
        tf = np.min(np.maximum(t0, t1))
        return max(tn, 0.0) if (tn <= tf and tf >= 0.0) else None

    for i in range(0, 128, 7):
        hits = [(entry_t(i, c), c) for c in range(nc)]
        hits = [(t, c) for t, c in hits if t is not None]
        if not hits:
            assert got[i] == nc
            continue
        best_t = min(t for t, _ in hits)
        assert got[i] != nc
        t_got = entry_t(i, int(got[i]))
        # the packed key chops tn to 2^-11 relative: the returned cluster
        # must be within one chop step of the true nearest
        assert t_got is not None
        assert t_got <= best_t * (1.0 + 2.0 ** -10) + 1e-6


def test_pallas_uv_test_parity():
    """Thin grazing geometry (the uv_test building of slim cylinders) is
    where the chopped-t shade origin used to break the < 1e-3 cross-tracer
    parity bar (~1e-2 RMSE, VERDICT round 2 #4).  With the exact-t
    recompute from the shade row the bar must hold on EVERY scene —
    no documented exceptions."""
    from metal_raytracing_tpu.renderer import Renderer
    from metal_raytracing_tpu.scenes import uv_test_scene
    from metal_raytracing_tpu.types import RenderConfig
    from metal_raytracing_tpu.io.image import rmse

    scene = uv_test_scene(48, 48)
    cfg_ref = RenderConfig(width=48, height=48, max_bounces=2,
                           tracer="bvh", ray_block=128)
    cfg_pal = RenderConfig(width=48, height=48, max_bounces=2,
                           tracer="pallas", ray_block=128)
    ref = Renderer(scene, cfg_ref).render(1)
    got = Renderer(scene, cfg_pal).render(1)
    assert rmse(ref, got) < 1e-3


def test_pallas_streamed_matches_resident(scene_data):
    """HBM-streamed triangle planes (forced) must equal the VMEM path."""
    data, spec = scene_data
    o, d = _rays(256, seed=7)
    mask = jnp.ones((256,), bool)
    res = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                           data.tri_planes, spec.bvh, block=128,
                           stream=False)
    strm = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                            data.tri_planes, spec.bvh, block=128,
                            stream=True)
    np.testing.assert_array_equal(np.asarray(strm.tri), np.asarray(res.tri))
    np.testing.assert_array_equal(np.asarray(strm.t), np.asarray(res.t))
    max_t = jnp.full((256,), 4.0)
    res_a = TP.trace_any(o, d, max_t, mask, data.sup_planes, data.clu_planes,
                         data.tri_planes, spec.bvh, block=128, stream=False)
    strm_a = TP.trace_any(o, d, max_t, mask, data.sup_planes,
                          data.clu_planes, data.tri_planes, spec.bvh,
                          block=128, stream=True)
    np.testing.assert_array_equal(np.asarray(strm_a), np.asarray(res_a))


def test_pallas_streamed_pair_double_buffer_matches_resident(scene_data):
    """pair_visits + stream now takes the DOUBLE-BUFFERED path (two
    scratch slabs, the second cluster's DMA overlapping the first dense
    test — VERDICT round 4 weak #5); results must stay bit-identical to
    the resident one-visit walk (the packed min / occlusion max are
    order-independent).  flat=False forces the hierarchical kernel, the
    only one with a pair schedule."""
    data, spec = scene_data
    o, d = _rays(256, seed=11)
    mask = jnp.ones((256,), bool)
    res = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                           data.tri_planes, spec.bvh, block=128,
                           stream=False, flat=False)
    strm = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                            data.tri_planes, spec.bvh, block=128,
                            stream=True, flat=False, pair_visits=True)
    np.testing.assert_array_equal(np.asarray(strm.tri), np.asarray(res.tri))
    np.testing.assert_array_equal(np.asarray(strm.t), np.asarray(res.t))
    max_t = jnp.full((256,), 4.0)
    res_a = TP.trace_any(o, d, max_t, mask, data.sup_planes, data.clu_planes,
                         data.tri_planes, spec.bvh, block=128, stream=False,
                         flat=False)
    strm_a = TP.trace_any(o, d, max_t, mask, data.sup_planes,
                          data.clu_planes, data.tri_planes, spec.bvh,
                          block=128, stream=True, flat=False,
                          pair_visits=True)
    np.testing.assert_array_equal(np.asarray(strm_a), np.asarray(res_a))


def test_pallas_scalar_seed_matches_chunk_seed(scene_data, monkeypatch):
    """The scalar-unrolled global seed (GLOBAL_SCALAR_MAX knob; SMEM plane
    scalars x (1, R) row tests) must agree with the default dense-chunk
    seed — plane_sphere carries 2 real global triangles, so both paths
    actually run the seed.  The scalar path measured slightly slower on
    TPU (297.7 vs 293.5 ms/sample, dragon 1024^2) and is kept as a knob;
    this test keeps it from rotting."""
    data, spec = scene_data
    assert spec.bvh.num_global > 0  # the seed paths are actually exercised
    o, d = _rays(256, seed=11)
    mask = jnp.ones((256,), bool)
    chunk = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                             data.tri_planes, spec.bvh, block=128)
    monkeypatch.setattr(TP, "GLOBAL_SCALAR_MAX", 16)
    scal = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                            data.tri_planes, spec.bvh, block=128)
    np.testing.assert_array_equal(np.asarray(scal.tri), np.asarray(chunk.tri))
    np.testing.assert_array_equal(np.asarray(scal.t), np.asarray(chunk.t))
    max_t = jnp.full((256,), 4.0)
    monkeypatch.setattr(TP, "GLOBAL_SCALAR_MAX", 0)
    chunk_a = TP.trace_any(o, d, max_t, mask, data.sup_planes,
                           data.clu_planes, data.tri_planes, spec.bvh,
                           block=128)
    monkeypatch.setattr(TP, "GLOBAL_SCALAR_MAX", 16)
    scal_a = TP.trace_any(o, d, max_t, mask, data.sup_planes,
                          data.clu_planes, data.tri_planes, spec.bvh,
                          block=128)
    np.testing.assert_array_equal(np.asarray(scal_a), np.asarray(chunk_a))


@pytest.mark.parametrize("flat", [True, False])
def test_pallas_chunk_skip_matches_full_unroll(flat):
    """The partial-cluster chunk skip (sah_free builds carry per-cluster
    triangle counts; dense-test chunks past the count hold only padding)
    must be BIT-identical to the full static unroll — skipped chunks can
    only contain degenerate never-hit triangles."""
    scene = plane_sphere_scene(32, 32)
    data, spec = scene.build(cluster_size=384, builder="sah_chunk")
    assert spec.bvh.partial_clusters  # the skip path is actually exercised
    assert int(jnp.max(data.clu_counts)) <= 384
    o, d = _rays(256, seed=7)
    mask = jnp.ones((256,), bool)
    kw = dict(block=128, flat=flat)
    full = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                            data.tri_planes, spec.bvh, **kw)
    skip = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                            data.tri_planes, spec.bvh,
                            counts=data.clu_counts, **kw)
    np.testing.assert_array_equal(np.asarray(skip.tri), np.asarray(full.tri))
    np.testing.assert_array_equal(np.asarray(skip.t), np.asarray(full.t))
    max_t = jnp.full((256,), 4.0)
    full_a = TP.trace_any(o, d, max_t, mask, data.sup_planes,
                          data.clu_planes, data.tri_planes, spec.bvh, **kw)
    skip_a = TP.trace_any(o, d, max_t, mask, data.sup_planes,
                          data.clu_planes, data.tri_planes, spec.bvh,
                          counts=data.clu_counts, **kw)
    np.testing.assert_array_equal(np.asarray(skip_a), np.asarray(full_a))


def test_host_seed_matches_kernel_seed(scene_data):
    """The host-computed global-seed key path (trace_closest seed_key=...)
    must agree with the in-kernel chunk seed.  In interpret mode both
    divides are exact, so the packed keys — and therefore hits — match
    bit-for-bit; on hardware they may differ only inside the 2^-14 key
    chop (covered by the image-level parity gates)."""
    data, spec = scene_data
    assert spec.bvh.num_global > 0
    o, d = _rays(256, seed=13)
    mask = jnp.ones((256,), bool)
    base = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                            data.tri_planes, spec.bvh, block=128)
    skey = TP.global_seed_keys(o, d, mask, data.tri_planes, spec.bvh)
    seeded = TP.trace_closest(o, d, mask, data.sup_planes, data.clu_planes,
                              data.tri_planes, spec.bvh, block=128,
                              seed_key=skey)
    np.testing.assert_array_equal(np.asarray(seeded.tri),
                                  np.asarray(base.tri))
    np.testing.assert_array_equal(np.asarray(seeded.t), np.asarray(base.t))
    # any-hit: host fold (mask out globally-occluded rays + seed_global
    # False) must equal the in-kernel seeded query
    max_t = jnp.full((256,), 4.0)
    base_a = TP.trace_any(o, d, max_t, mask, data.sup_planes,
                          data.clu_planes, data.tri_planes, spec.bvh,
                          block=128)
    g_occ = TP.global_any_hit(o, d, max_t, mask, data.tri_planes, spec.bvh)
    folded = TP.trace_any(o, d, max_t, mask & ~g_occ, data.sup_planes,
                          data.clu_planes, data.tri_planes, spec.bvh,
                          block=128, seed_global=False)
    np.testing.assert_array_equal(np.asarray(folded | g_occ),
                                  np.asarray(base_a))
