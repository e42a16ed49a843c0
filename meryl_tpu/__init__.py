"""meryl_tpu: a TPU-native k-mer counting and k-mer-set engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
marbl/meryl (see /root/repo/SURVEY.md): canonical k-mer counting into a
64-way prefix-partitioned sorted database, a command-line tree of set/
arithmetic actions over databases, histogram/statistics/ploidy reports,
and a batched exact-lookup query engine.
"""

__version__ = "0.1.0"

from . import kmer  # noqa: F401
