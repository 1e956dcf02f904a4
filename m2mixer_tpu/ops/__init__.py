from .dynamixer_kernel import (  # noqa: F401
    DynaMixerOpParams,
    dynamixer_op_reference,
    fused_dynamixer_op,
)
from .gmlp_kernel import GmlpBlockParams, fused_gmlp_block, gmlp_block_reference  # noqa: F401
from .mixer_kernel import (  # noqa: F401
    MixerBlockParams,
    fused_mixer_block,
    fused_mixer_stack,
    mixer_block_reference,
    stack_flat_params,
)
