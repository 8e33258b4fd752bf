"""Fused Pallas broad-phase kernel vs the XLA reference forms.

``broadphase_keys`` must reproduce ``nearest_cluster`` (packed keys, both
ranks, with and without max_t), ``global_seed_keys`` (same winner index;
t within the Newton-refinement tolerance), and ``global_any_hit``
(exactly) — it replaces all three on the render hot path (VERDICT round 3
#2).  Runs in interpret mode on CPU (conftest forces the CPU backend).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from metal_raytracing_tpu.ops import trace_pallas as TP
from metal_raytracing_tpu.scenes import get_scene


@pytest.fixture(scope="module")
def built():
    scene = get_scene("plane_sphere", 64, 64)
    return scene.build(cluster_size=384, builder="sah_free")


def _rays(n, seed):
    rng = np.random.RandomState(seed)
    o = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    mask = jnp.asarray(rng.rand(n) > 0.2)
    maxt = jnp.asarray(rng.uniform(0.5, 8.0, (n,)).astype(np.float32))
    return o, d, mask, maxt


@pytest.mark.parametrize("block", [128, 256])
def test_closest_mode_matches_xla(built, block):
    data, spec = built
    o, d, mask, _ = _rays(512, seed=3)
    ncp = data.clu_planes.shape[0] * data.clu_planes.shape[1]
    k1, k2, g = TP.broadphase_keys(o, d, mask, data.clu_planes,
                                   data.tri_planes, spec.bvh, want2=True,
                                   block=block)
    cid_ref, key_ref, cid2_ref = TP.nearest_cluster(
        o, d, mask, data.clu_planes, spec.bvh, return_key=True,
        return_second=1)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(key_ref))
    np.testing.assert_array_equal(
        np.asarray(TP.decode_cluster_key(k1, ncp)), np.asarray(cid_ref))
    np.testing.assert_array_equal(
        np.asarray(TP.decode_cluster_key(k2, ncp)), np.asarray(cid2_ref))
    # global-seed key: winner index exact; t bits within the Newton
    # refinement tolerance of the exact divide
    gk_ref = TP.global_seed_keys(o, d, mask, data.tri_planes, spec.bvh)
    g_np, ref_np = np.asarray(g), np.asarray(gk_ref)
    miss = g_np == TP._INIT_KEY
    np.testing.assert_array_equal(miss, ref_np == TP._INIT_KEY)
    np.testing.assert_array_equal(g_np[~miss] & TP.IDX_MASK,
                                  ref_np[~miss] & TP.IDX_MASK)
    gt = np.asarray(TP._key_to_t(g))[~miss]
    gt_ref = np.asarray(TP._key_to_t(gk_ref))[~miss]
    np.testing.assert_allclose(gt, gt_ref, rtol=1e-4)


def test_any_mode_matches_xla(built):
    data, spec = built
    o, d, mask, maxt = _rays(512, seed=5)
    ncp = data.clu_planes.shape[0] * data.clu_planes.shape[1]
    k1, _, g = TP.broadphase_keys(o, d, mask, data.clu_planes,
                                  data.tri_planes, spec.bvh, max_t=maxt,
                                  any_mode=True, block=128)
    cid_ref = TP.nearest_cluster(o, d, mask, data.clu_planes, spec.bvh,
                                 max_t=maxt)
    occ_ref = TP.global_any_hit(o, d, maxt, mask, data.tri_planes, spec.bvh)
    np.testing.assert_array_equal(
        np.asarray(TP.decode_cluster_key(k1, ncp)), np.asarray(cid_ref))
    np.testing.assert_array_equal(np.asarray(g > 0), np.asarray(occ_ref))


def test_global_only_variant(built):
    data, spec = built
    o, d, mask, _ = _rays(256, seed=7)
    k1, k2, g = TP.broadphase_keys(o, d, mask, data.clu_planes,
                                   data.tri_planes, spec.bvh,
                                   with_clusters=False, block=128)
    assert k1 is None and k2 is None
    gk_ref = TP.global_seed_keys(o, d, mask, data.tri_planes, spec.bvh)
    np.testing.assert_array_equal(np.asarray(g) & TP.IDX_MASK,
                                  np.asarray(gk_ref) & TP.IDX_MASK)


def test_dead_tiles_write_sentinels(built):
    data, spec = built
    o, d, _, maxt = _rays(256, seed=9)
    mask = jnp.zeros((256,), bool)
    k1, _, g = TP.broadphase_keys(o, d, mask, data.clu_planes,
                                  data.tri_planes, spec.bvh, block=128)
    assert int(jnp.sum(k1 != TP._NC_SENT)) == 0
    if g is not None:
        assert int(jnp.sum(g != TP._INIT_KEY)) == 0
    k1a, _, ga = TP.broadphase_keys(o, d, mask, data.clu_planes,
                                    data.tri_planes, spec.bvh, max_t=maxt,
                                    any_mode=True, block=128)
    assert int(jnp.sum(k1a != TP._NC_SENT)) == 0
    if ga is not None:
        assert int(jnp.sum(ga)) == 0


def test_rank2_single_pass_reduce_matches_two_pass(built):
    """The single variadic (min, second-min) reduce must equal the legacy
    two-pass rank-2 broad phase EXACTLY (the combiner is associative and
    exact; unique id low bits make keys distinct) — with and without
    max_t, across masked rays."""
    data, spec = built
    o, d, mask, maxt = _rays(512, seed=11)
    for mt in (None, maxt):
        TP.RANK2_TWO_PASS = True
        try:
            ref = TP.nearest_cluster(o, d, mask, data.clu_planes, spec.bvh,
                                     max_t=mt, return_key=True,
                                     return_second=1)
            TP.RANK2_TWO_PASS = False
            got = TP.nearest_cluster(o, d, mask, data.clu_planes, spec.bvh,
                                     max_t=mt, return_key=True,
                                     return_second=1)
        finally:
            TP.RANK2_TWO_PASS = False
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rank3_single_pass_matches_sequential_remin(built):
    """The single-pass 3-smallest merge combiner (m3 = min(a3, b3,
    max(a1,b2), max(a2,b1))) must equal the sequential re-min form
    exactly, packed and decoded."""
    data, spec = built
    o, d, mask, maxt = _rays(512, seed=13)
    ncp = data.clu_planes.shape[0] * data.clu_planes.shape[1]
    TP.RANK2_TWO_PASS = True
    try:
        ref = TP.nearest_cluster(o, d, mask, data.clu_planes, spec.bvh,
                                 return_key=True, return_second=2,
                                 return_packed=True)
        TP.RANK2_TWO_PASS = False
        got = TP.nearest_cluster(o, d, mask, data.clu_planes, spec.bvh,
                                 return_key=True, return_second=2,
                                 return_packed=True)
    finally:
        TP.RANK2_TWO_PASS = False
    assert len(ref) == len(got) == 4  # cid, key1, key2, key3 (packed)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # packed extras decode to the id forms
    got_ids = TP.nearest_cluster(o, d, mask, data.clu_planes, spec.bvh,
                                 return_key=True, return_second=2)
    for kp, ki in zip(got[2:], got_ids[2:]):
        np.testing.assert_array_equal(
            np.asarray(TP.decode_cluster_key(kp, ncp)), np.asarray(ki))
    # ranks are ordered near-to-far: entry t monotone over present ranks
    k1, k2, k3 = (np.asarray(x) for x in got[1:])
    t1, t2, t3 = (np.asarray(TP._key_to_t(jnp.asarray(k & ~TP._NC_IDM)))
                  for k in (k1, k2, k3))
    p2 = k2 != TP._NC_SENT
    p3 = k3 != TP._NC_SENT
    assert np.all(t1[p2] <= t2[p2]) and np.all(t2[p3] <= t3[p3])
    assert np.all(p2[p3])  # rank 3 present implies rank 2 present


def test_nearest_cluster_pair_rank3_packed(built):
    """ranks=3 pair fusion: shadow rank-1 + bounce 3-smallest in one
    reduce must equal the separate calls bit-exactly."""
    data, spec = built
    o, d_sh, mask_sh, maxt = _rays(512, seed=31)
    _, d_nb, mask_nb, _ = _rays(512, seed=32)
    scid, cid, k1, k2, k3 = TP.nearest_cluster_pair(
        o, d_sh, maxt, mask_sh, d_nb, mask_nb, data.clu_planes, spec.bvh,
        ranks=3, return_packed=True)
    s_ref = TP.nearest_cluster(o, d_sh, mask_sh, data.clu_planes,
                               spec.bvh, max_t=maxt)
    c_ref, k1_ref, k2_ref, k3_ref = TP.nearest_cluster(
        o, d_nb, mask_nb, data.clu_planes, spec.bvh, return_key=True,
        return_second=2, return_packed=True)
    np.testing.assert_array_equal(np.asarray(scid), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(cid), np.asarray(c_ref))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k1_ref))
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k2_ref))
    np.testing.assert_array_equal(np.asarray(k3), np.asarray(k3_ref))


def test_nearest_cluster_pair_matches_separate_calls(built):
    """nearest_cluster_pair (shadow rank-1 + bounce rank-2 in ONE
    variadic reduce over shared (box - o) subtrahends) must equal the
    two separate nearest_cluster calls BIT-EXACTLY — shared origins,
    independent directions/masks, shadow side bounded by max_t."""
    data, spec = built
    o, d_sh, mask_sh, maxt = _rays(512, seed=21)
    _, d_nb, mask_nb, _ = _rays(512, seed=22)  # same origins, new dirs
    scid, cid, nckey, cid2 = TP.nearest_cluster_pair(
        o, d_sh, maxt, mask_sh, d_nb, mask_nb, data.clu_planes, spec.bvh)
    s_ref = TP.nearest_cluster(o, d_sh, mask_sh, data.clu_planes,
                               spec.bvh, max_t=maxt)
    c_ref, k_ref, c2_ref = TP.nearest_cluster(
        o, d_nb, mask_nb, data.clu_planes, spec.bvh, return_key=True,
        return_second=1)
    np.testing.assert_array_equal(np.asarray(scid), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(cid), np.asarray(c_ref))
    np.testing.assert_array_equal(np.asarray(nckey), np.asarray(k_ref))
    np.testing.assert_array_equal(np.asarray(cid2), np.asarray(c2_ref))
