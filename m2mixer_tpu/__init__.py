"""m2mixer_tpu — a TPU-native multimodal MLP-Mixer framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``bezirganyan/m2-mixer`` (IEEE BigData 2023): the M2-Mixer model zoo
(MLP-Mixer / gMLP / DynaMixer blocks + fusion operators), the multi-head-loss
multimodal training recipe (static / annealed / SoftAdapt / GradBlend loss
weighting, modality freezing and muting curricula), the dataset stack, and
the config-driven CLI — re-designed TPU-first: one jitted train step,
``jax.sharding`` data/tensor parallelism over a device mesh, Pallas kernels
for the mixer primitives, Orbax checkpointing, and host-side Grain/numpy
input pipelines.
"""

__version__ = "0.1.0"
