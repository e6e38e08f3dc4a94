"""maskdit_tpu — a TPU-native JAX framework for masked diffusion transformers.

A from-scratch rebuild of the capability set of Anima-Lab/MaskDiT ("Fast
Training of Diffusion Models with Masked Transformers", TMLR 2024) designed
for TPU hardware: Flax/linen models, XLA collectives over device meshes,
Pallas kernels on the hot path, and a host-side native IO runtime.

Layer map (mirrors SURVEY.md §1):
  L0 runtime/distributed  -> maskdit_tpu.parallel
  L1 data                 -> maskdit_tpu.data
  L2 models               -> maskdit_tpu.models
  L3 objective            -> maskdit_tpu.train
  L4 inference            -> maskdit_tpu.sampling
  L5 evaluation           -> maskdit_tpu.evals
  L6 entry points         -> maskdit_tpu.cli_* / repo-root scripts
"""

__version__ = "0.1.0"
