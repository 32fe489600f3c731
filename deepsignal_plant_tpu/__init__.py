"""deepsignal_plant_tpu — a TPU-native (JAX/XLA/Pallas) nanopore 5mC methylation
calling engine for plants.

Re-designed from scratch for TPU hardware with the capabilities of
PengNi/deepsignal-plant (reference: deepsignal_plant/deepsignal_plant.py:85):

- ``extract``    : per-site feature extraction from tombo-resquiggled fast5s
- ``call_mods``  : per-read methylation calling with a BiLSTM classifier
- ``call_freq``  : genome-level methylation frequency aggregation
- ``train``      : model training (optax, data-parallel over a device mesh)
- ``denoise``    : cross-rank label cleaning loop

Compute path is JAX/XLA (+ Pallas fused kernels); host runtime is
numpy-vectorized with an optional C++ fast path for TSV codecs.
"""
from ._version import DEEPSIGNAL_PLANT_TPU_VERSION as __version__
