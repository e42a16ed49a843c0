from . import shard_count  # noqa: F401
