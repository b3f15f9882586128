"""Custom TPU kernels (Pallas) for hot ops.

The engine's hot path currently compiles to fused XLA (matmul + elementwise
+ gathers) which the compiler schedules well at these shapes; Pallas kernels
land here when profiling shows a fusion XLA misses.
"""
