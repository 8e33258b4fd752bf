"""Device-side compute ops: intersection primitives and traversal kernels."""
