from .mesh import (  # noqa: F401
    MeshConfig,
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_batch,
    shard_params,
)
from .pipeline import (  # noqa: F401
    pipeline_apply,
    pipeline_mesh,
    pipeline_stages,
    set_pipeline_mesh,
)
