"""Transform kernels: jnp reference path + fused Pallas TPU kernels."""
