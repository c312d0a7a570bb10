"""Device-mesh parallelism: batch (data) and spatial sharding of the develop
pipeline over ICI via jax.sharding + jit (SPMD)."""
