"""metal_raytracing_tpu — a TPU-native wavefront path tracer in JAX/Pallas.

A from-scratch rebuild of the capabilities of JaapWijnen/metal-raytracing
(Swift + Metal) as an idiomatic TPU framework:

- Scene/material/light description mirrors the reference ABI
  (reference: MetalRaytracing/ShaderTypes.h:60-107).
- Metal's closed-source acceleration structures + ``intersector`` are replaced
  by an on-device cluster BVH (Morton-ordered triangle clusters) with dense,
  fully-vectorized slab/Möller-Trumbore tests in a Pallas TPU kernel.
- The per-pixel megakernel (reference: MetalRaytracing/Raytracing.metal:156-405)
  becomes a wavefront pipeline: batched raygen → trace → shade → shadow →
  accumulate, all under ``jit`` with static shapes and masked lanes instead of
  SIMT divergence.
- Multi-chip scaling via ``jax.sharding.Mesh`` + ``shard_map`` (sample- and
  tile-sharding with ``psum`` accumulation) instead of multi-GPU queues.
"""

__version__ = "0.1.0"

from .types import (  # noqa: F401
    Camera,
    Light,
    LightType,
    Material,
    RenderConfig,
)
