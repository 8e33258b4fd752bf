"""Ray traversal: brute-force oracle + packet BVH traversal (pure jnp).

Together these replace Metal's ``intersector<triangle_data, instancing>``
closest-hit / any-hit queries (reference: Raytracing.metal:230-244, 360-367).
Design notes (TPU-first):

- A TPU TensorCore runs ONE instruction stream — there is no SIMT. So instead
  of one thread per ray, rays are processed in *packets* (blocks) of R rays
  that share a traversal stack: the stack logic is scalar, while every node
  visit does dense R-wide vector work (R x B AABB slabs at internal nodes,
  R x C Moller-Trumbore at leaf clusters).  Blocks are processed sequentially
  with ``lax.while_loop``-per-block under ``lax.scan`` — real branches, no
  lockstep across blocks.
- All shapes are static: the stack is a fixed array with a spill-proof dump
  slot, compaction uses cumsum positions, and "no hit" is t = 1e30.

``trace_closest_bruteforce`` is the O(N*T) oracle used by tests and tiny
scenes; the packet tracer must match it exactly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..accel import BVHSpec
from .intersect import BIG_T, moller_trumbore, ray_aabb, safe_inverse

__all__ = [
    "Hit",
    "trace_closest_bruteforce",
    "trace_any_bruteforce",
    "trace_closest",
    "trace_any",
]


class Hit(NamedTuple):
    t: jnp.ndarray  # (N,) f32 distance (BIG_T when missed)
    u: jnp.ndarray  # (N,) f32 barycentric (corner 1 weight)
    v: jnp.ndarray  # (N,) f32 barycentric (corner 2 weight)
    tri: jnp.ndarray  # (N,) i32 triangle index into the sorted SoA (-1 = miss)

    @property
    def found(self) -> jnp.ndarray:
        return self.tri >= 0


def _min_update(best, t, u, v, hit_mask, tri_base, c):
    """Fold an (R, C) intersection block into per-ray best records."""
    best_t, best_u, best_v, best_tri = best
    tt = jnp.where(hit_mask, t, BIG_T)
    j = jnp.argmin(tt, axis=1)
    take = lambda a: jnp.take_along_axis(a, j[:, None], axis=1)[:, 0]
    tj = take(tt)
    upd = tj < best_t
    return (
        jnp.where(upd, tj, best_t),
        jnp.where(upd, take(u), best_u),
        jnp.where(upd, take(v), best_v),
        jnp.where(upd, tri_base + j.astype(jnp.int32), best_tri),
    )


# ---------------------------------------------------------------------------
# Brute force (oracle)
# ---------------------------------------------------------------------------


def trace_closest_bruteforce(o, d, mask, geometry, chunk: int = 2048) -> Hit:
    """Closest hit by testing every ray against every triangle, scanned in
    triangle chunks to bound memory.  The correctness oracle for the packet
    tracer (SURVEY.md §4 test strategy)."""
    n = o.shape[0]
    t_total = geometry.v0.shape[0]
    chunk = min(chunk, t_total)
    num_chunks = -(-t_total // chunk)
    pad = num_chunks * chunk - t_total

    def padded(a):
        return jnp.pad(a, ((0, pad), (0, 0))) if pad else a

    v0 = padded(geometry.v0).reshape(num_chunks, chunk, 3)
    e1 = padded(geometry.e1).reshape(num_chunks, chunk, 3)
    e2 = padded(geometry.e2).reshape(num_chunks, chunk, 3)

    init = (
        jnp.full((n,), BIG_T),
        jnp.zeros((n,)),
        jnp.zeros((n,)),
        jnp.full((n,), -1, jnp.int32),
    )

    def body(best, args):
        ci, cv0, ce1, ce2 = args
        t, u, v, hit = moller_trumbore(
            o[:, None, :], d[:, None, :], cv0[None], ce1[None], ce2[None])
        hit = hit & mask[:, None]
        return _min_update(best, t, u, v, hit, ci * chunk, chunk), None

    best, _ = jax.lax.scan(
        body, init, (jnp.arange(num_chunks, dtype=jnp.int32), v0, e1, e2))
    best_t, best_u, best_v, best_tri = best
    return Hit(t=best_t, u=best_u, v=best_v, tri=best_tri)


def trace_any_bruteforce(o, d, max_t, mask, geometry, chunk: int = 2048):
    """Occlusion oracle: True where any triangle lies within (0, max_t)."""
    hit = trace_closest_bruteforce(o, d, mask, geometry, chunk=chunk)
    return hit.found & (hit.t <= max_t)


# ---------------------------------------------------------------------------
# Packet BVH traversal
# ---------------------------------------------------------------------------


def _slice_rows(a, start, size):
    return jax.lax.dynamic_slice_in_dim(a, start, size, axis=0)


def _packet_closest(o, d, mask, geometry, node_lo, node_hi, spec: BVHSpec):
    """Closest-hit packet traversal for one block of R rays."""
    r = o.shape[0]
    b = spec.branching
    c = spec.cluster_size
    stack_size = spec.max_stack
    inv_d = safe_inverse(d)

    class State(NamedTuple):
        sp: jnp.ndarray
        stack: jnp.ndarray
        best_t: jnp.ndarray
        best_u: jnp.ndarray
        best_v: jnp.ndarray
        best_tri: jnp.ndarray

    init = State(
        sp=jnp.int32(1),
        stack=jnp.zeros((stack_size + 1,), jnp.int32),
        best_t=jnp.full((r,), BIG_T),
        best_u=jnp.zeros((r,)),
        best_v=jnp.zeros((r,)),
        best_tri=jnp.full((r,), -1, jnp.int32),
    )

    if spec.num_global:
        # Global triangles (scene-spanning planes, excluded from the
        # clusters — BVHSpec.num_global) are tested up front; the hit also
        # SEEDS best_t, tightening every node's t_max cull below.
        gb = spec.global_base
        gv0 = _slice_rows(geometry.v0, gb, spec.padded_global)
        ge1 = _slice_rows(geometry.e1, gb, spec.padded_global)
        ge2 = _slice_rows(geometry.e2, gb, spec.padded_global)
        t, u, v, hit = moller_trumbore(
            o[:, None, :], d[:, None, :], gv0[None], ge1[None], ge2[None])
        hit = hit & mask[:, None]
        best = _min_update(
            (init.best_t, init.best_u, init.best_v, init.best_tri),
            t, u, v, hit, gb, spec.padded_global)
        init = init._replace(best_t=best[0], best_u=best[1],
                             best_v=best[2], best_tri=best[3])

    def leaf_fn(st: State, node):
        cidx = node - spec.first_leaf
        base = cidx * c
        v0 = _slice_rows(geometry.v0, base, c)
        e1 = _slice_rows(geometry.e1, base, c)
        e2 = _slice_rows(geometry.e2, base, c)
        t, u, v, hit = moller_trumbore(
            o[:, None, :], d[:, None, :], v0[None], e1[None], e2[None])
        hit = hit & mask[:, None] & (t < st.best_t[:, None])
        best = _min_update(
            (st.best_t, st.best_u, st.best_v, st.best_tri), t, u, v, hit,
            base, c)
        return st._replace(best_t=best[0], best_u=best[1], best_v=best[2],
                           best_tri=best[3])

    def internal_fn(st: State, node):
        child0 = node * b + 1
        clo = _slice_rows(node_lo, child0, b)
        chi = _slice_rows(node_hi, child0, b)
        tn, hit = ray_aabb(
            o[:, None, :], inv_d[:, None, :], clo[None], chi[None],
            t_max=st.best_t[:, None])
        hit = hit & mask[:, None]  # (R, B)
        push = jnp.any(hit, axis=0)  # (B,)
        t_entry = jnp.min(jnp.where(hit, tn, BIG_T), axis=0)  # (B,)
        # Push far children first so the nearest is popped first.
        order = jnp.argsort(-t_entry)
        push_sorted = push[order]
        child_sorted = child0 + order.astype(jnp.int32)
        cnt = jnp.cumsum(push_sorted.astype(jnp.int32))
        pos = jnp.where(push_sorted, st.sp + cnt - 1, stack_size)
        stack = st.stack.at[pos].set(child_sorted)
        return st._replace(sp=st.sp + cnt[-1], stack=stack)

    def body(st: State):
        sp = st.sp - 1
        node = st.stack[sp]
        st = st._replace(sp=sp)
        return jax.lax.cond(node >= spec.first_leaf, leaf_fn, internal_fn,
                            st, node)

    def cond(st: State):
        return st.sp > 0

    if spec.levels == 0:  # root is the only (leaf) node: no traversal
        final = leaf_fn(init, jnp.int32(0))
    else:
        final = jax.lax.while_loop(cond, body, init)
    return Hit(t=final.best_t, u=final.best_u, v=final.best_v,
               tri=final.best_tri)


def _packet_any(o, d, max_t, mask, geometry, node_lo, node_hi, spec: BVHSpec):
    """Any-hit (occlusion) packet traversal for one block of R rays, with
    early termination once every masked ray is occluded — the wavefront
    counterpart of ``accept_any_intersection(true)``
    (reference: Raytracing.metal:360-367)."""
    r = o.shape[0]
    b = spec.branching
    c = spec.cluster_size
    stack_size = spec.max_stack
    inv_d = safe_inverse(d)

    class State(NamedTuple):
        sp: jnp.ndarray
        stack: jnp.ndarray
        occluded: jnp.ndarray

    init = State(
        sp=jnp.int32(1),
        stack=jnp.zeros((stack_size + 1,), jnp.int32),
        occluded=jnp.zeros((r,), bool),
    )

    if spec.num_global:
        gb = spec.global_base
        gv0 = _slice_rows(geometry.v0, gb, spec.padded_global)
        ge1 = _slice_rows(geometry.e1, gb, spec.padded_global)
        ge2 = _slice_rows(geometry.e2, gb, spec.padded_global)
        _, _, _, hit = moller_trumbore(
            o[:, None, :], d[:, None, :], gv0[None], ge1[None], ge2[None],
            t_max=max_t[:, None])
        hit = hit & mask[:, None]
        init = init._replace(occluded=jnp.any(hit, axis=1))

    def leaf_fn(st: State, node, active):
        base = (node - spec.first_leaf) * c
        v0 = _slice_rows(geometry.v0, base, c)
        e1 = _slice_rows(geometry.e1, base, c)
        e2 = _slice_rows(geometry.e2, base, c)
        t, _, _, hit = moller_trumbore(
            o[:, None, :], d[:, None, :], v0[None], e1[None], e2[None],
            t_max=max_t[:, None])
        hit = hit & active[:, None]
        return st._replace(occluded=st.occluded | jnp.any(hit, axis=1))

    def internal_fn(st: State, node, active):
        child0 = node * b + 1
        clo = _slice_rows(node_lo, child0, b)
        chi = _slice_rows(node_hi, child0, b)
        _, hit = ray_aabb(
            o[:, None, :], inv_d[:, None, :], clo[None], chi[None],
            t_max=max_t[:, None])
        hit = hit & active[:, None]
        push = jnp.any(hit, axis=0)
        cnt = jnp.cumsum(push.astype(jnp.int32))
        pos = jnp.where(push, st.sp + cnt - 1, stack_size)
        children = child0 + jnp.arange(b, dtype=jnp.int32)
        stack = st.stack.at[pos].set(children)
        return st._replace(sp=st.sp + cnt[-1], stack=stack)

    def body(st: State):
        sp = st.sp - 1
        node = st.stack[sp]
        st = st._replace(sp=sp)
        active = mask & ~st.occluded
        return jax.lax.cond(node >= spec.first_leaf, leaf_fn, internal_fn,
                            st, node, active)

    def cond(st: State):
        return (st.sp > 0) & jnp.any(mask & ~st.occluded)

    if spec.levels == 0:  # root is the only (leaf) node: no traversal
        final = leaf_fn(init, jnp.int32(0), mask)
    else:
        final = jax.lax.while_loop(cond, body, init)
    return final.occluded


def _run_blocked(fn, n_args, block, *arrays):
    """Reshape N-leading arrays into (num_blocks, block, ...) and lax.map the
    per-block function over them.  N must be a multiple of ``block``."""
    n = arrays[0].shape[0]
    assert n % block == 0, f"ray count {n} not a multiple of block {block}"
    nb = n // block
    blocked = [a.reshape((nb, block) + a.shape[1:]) for a in arrays]
    out = jax.lax.map(lambda xs: fn(*xs), tuple(blocked))
    return jax.tree.map(lambda a: a.reshape((n,) + a.shape[2:]), out)


def trace_closest(o, d, mask, geometry, node_lo, node_hi, spec: BVHSpec,
                  block: int = 256) -> Hit:
    """Blocked closest-hit query over N rays (N divisible by ``block``)."""
    fn = functools.partial(_packet_closest, geometry=geometry,
                           node_lo=node_lo, node_hi=node_hi, spec=spec)
    return _run_blocked(fn, 3, block, o, d, mask)


def trace_any(o, d, max_t, mask, geometry, node_lo, node_hi, spec: BVHSpec,
              block: int = 256):
    """Blocked any-hit occlusion query over N rays."""
    fn = functools.partial(_packet_any, geometry=geometry,
                           node_lo=node_lo, node_hi=node_hi, spec=spec)
    return _run_blocked(fn, 4, block, o, d, max_t, mask)
