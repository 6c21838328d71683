"""glia_tpu: a TPU-native framework for hierarchical image segmentation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of tingliu/glia
(hierarchical merge-tree EM segmentation): watershed superpixels ->
region-adjacency graphs -> greedy merge trees -> boundary-feature extraction
-> RF/MLP merge classifiers -> tree inference -> VI/Rand evaluation, with
RAG edge partitioning across TPU meshes.

Subpackages
-----------
- ``io``       image / text artifact IO (file-bus compatible with reference)
- ``ops``      array primitives: neighbor ops, segment ops, watershed, Pallas kernels
- ``graph``    RAG construction, greedy merge engines, merge trees
- ``features`` region / boundary / merge-classifier features
- ``models``   random forest (vectorized TPU inference), MLP, ensembles
- ``learn``    losses, DNF constraint energies, optimizers, SSHMT training
- ``infer``    tree resolution (greedy / CCM) and final segmentation
- ``metrics``  VI, adapted Rand, pair-F1 (exact big-int pair counting)
- ``parallel`` device-mesh sharding: edge-partitioned RAG aggregation
- ``link3d``   section-to-section linking of 2D segmentations into 3D
"""

__version__ = "0.1.0"

from . import constants  # noqa: F401
