"""TPU-native multi-view stereo framework with CDS-MVSNet capabilities.

A ground-up JAX/XLA/Pallas implementation of the curvature-guided dynamic-scale
cascaded MVS network (reference behavior: TruongKhang/cds-mvsnet, ICLR 2022),
designed TPU-first: NHWC layouts, static shapes, fused plane-sweep kernels,
pjit/shard_map parallelism, and on-device fusion.
"""

__version__ = "0.1.0"
