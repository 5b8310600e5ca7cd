"""hipie_tpu: TPU-native language-guided universal segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of berkeley-hipie/HIPIE
(hierarchical open-vocabulary universal image segmentation): detection, instance /
semantic / panoptic segmentation, referring-expression grounding, open-vocabulary
label sets, and hierarchical part segmentation — designed for TPU meshes (pjit /
shard_map over ICI) rather than translated from the reference's CUDA/torch stack.
"""

__version__ = "0.1.0"
