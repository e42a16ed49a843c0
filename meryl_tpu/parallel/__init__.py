"""Multi-chip / multi-host counting.

Submodules are imported lazily: multihost launches must be able to
`import meryl_tpu.parallel.multihost` and join the jax.distributed job
BEFORE anything initializes the JAX backend, and shard_count's jitted
constants touch the backend at import time.
"""
