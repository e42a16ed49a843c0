"""meryl2: the generalized (kmer, value, label) model with an
assign/select algebra.  The v1 operations are aliases of this model
(/root/reference/documentation/source/reference.rst:253-372)."""
