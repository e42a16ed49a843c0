import sys

# A multi-host launch (MERYL_TPU_COORD contract) must join the
# jax.distributed job before ANYTHING initializes the JAX backend —
# platform and device-count configs are immutable afterwards.
from .parallel import multihost as _mh

if _mh.env_requested():
    _mh.init_from_env()

from .cli import main  # noqa: E402

sys.exit(main())
