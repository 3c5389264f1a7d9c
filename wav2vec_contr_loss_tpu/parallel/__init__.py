from .mesh import (  # noqa: F401
    batch_sharding,
    global_batch_from_local,
    make_mesh,
    param_sharding_rules,
    replicated,
    shard_params,
)
from .pipeline import gpipe_stack  # noqa: F401
