"""APE-TPU: a TPU-native (JAX/XLA/Pallas) rebuild of APE — "Aligning and Prompting
Everything" (CVPR 2024) — open-vocabulary detection, instance/semantic/panoptic
segmentation, and visual grounding with one text-prompted model.

Reference capability surface: shenyunhang/APE (see SURVEY.md).  This package is a
from-scratch design for TPU: functional flax models, static shapes with validity
masks, Pallas kernels for the hot ops, and `jax.sharding` meshes for scale-out.
"""

__version__ = "0.1.0"
