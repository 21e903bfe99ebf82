"""Hot compute ops: jnp reference implementations + Pallas TPU kernels."""
