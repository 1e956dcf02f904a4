from .mesh import (  # noqa: F401
    MeshConfig,
    activation_mesh,
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    set_activation_mesh,
    shard_batch,
    shard_params,
    shard_tokens,
)
from .pipeline import (  # noqa: F401
    pipeline_apply,
    pipeline_mesh,
    pipeline_stages,
    set_pipeline_mesh,
)
