"""Pallas TPU kernels with jnp fallbacks for the framework's hot ops."""

from far_tpu.ops.bilinear_attention import bilinear_dual_softmax
