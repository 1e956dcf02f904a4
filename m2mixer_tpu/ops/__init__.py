from .mixer_kernel import MixerBlockParams, fused_mixer_block, mixer_block_reference  # noqa: F401
