"""CMTCoop-TPU: a TPU-native cooperative 3D perception framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
suren3141/CMT-Cooperative-Perception (CMT "Cross Modal Transformer" extended to
vehicle+infrastructure cooperative perception). The compute path is pure
JAX/Pallas designed for the TPU MXU/VPU; data loading and geometry-heavy host
preprocessing live in `cmtcoop_tpu.data` (numpy + native C++ helpers).

Package map
-----------
- ``core``      box codecs, positional encodings, Hungarian matching, losses
- ``ops``       Pallas/XLA kernels: voxelization, sparse 3D conv, flash attention
- ``models``    flax modules: VoVNet/CPFPN, SECOND/FPN, sparse encoder, CMT heads
- ``parallel``  mesh/sharding utilities and pjit train/eval steps
- ``data``      datasets, augmentation pipelines, converters, eval protocol
- ``train``     optimizer groups, schedules, checkpointing, train loop
- ``configs``   the 9-cell {vehicle,infra,coop}x{C,L,CL} config matrix + nuScenes
"""

__version__ = "0.1.0"
