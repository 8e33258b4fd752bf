"""Profiling harness: jax.profiler traces + fenced timing.

The TPU-native replacement for the reference's only profiling affordance —
debug labels consumed by Xcode's Metal frame capture (SURVEY.md §5;
reference: Renderer.swift:109,135,203 etc.).  ``named_scope`` labels inside
jitted code show up in the profiler trace the way Metal debug labels show up
in a GPU capture.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax

__all__ = ["trace", "named_scope", "timed", "sync"]

named_scope = jax.named_scope  # re-export: the "label everything" discipline


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Fence: block until every array in the pytree is computed.

    Note: on remote-tunneled backends ``block_until_ready`` may return
    before device work completes; fetching a scalar is the reliable fence.
    """
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "block_until_ready")]
    for leaf in leaves:
        leaf.block_until_ready()
    if leaves:
        _ = float(leaves[-1].ravel()[0])


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 1):
    """Wall-clock a jitted function with proper fencing.

    Returns (seconds_per_call, last_output).  Calls are enqueued
    back-to-back and fenced once, so per-call dispatch latency amortizes the
    way it does in a real progressive render loop.
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters, out
