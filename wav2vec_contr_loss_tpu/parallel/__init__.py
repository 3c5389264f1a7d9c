from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    param_sharding_rules,
    replicated,
    shard_params,
)
