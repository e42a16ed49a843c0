"""meryl_tpu: a TPU-native k-mer counting and k-mer-set engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
marbl/meryl (see /root/repo/SURVEY.md): canonical k-mer counting into a
64-way prefix-partitioned sorted database, a command-line tree of set/
arithmetic actions over databases, histogram/statistics/ploidy reports,
and a batched exact-lookup query engine.
"""

__version__ = "0.1.0"

import os as _os


def _enable_compile_cache():
    """Persistent XLA compile cache: CLI invocations are separate
    processes, and the counting pipeline costs ~30s (TPU) to ~70s (CPU)
    to compile per shape signature.  Opt out with MERYL_TPU_NO_CACHE=1."""
    if _os.environ.get("MERYL_TPU_NO_CACHE"):
        return
    try:
        import jax
        cache = _os.environ.get(
            "MERYL_TPU_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "meryl_tpu", "jax"))
        _os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


_enable_compile_cache()

from . import kmer  # noqa: F401
