"""svecalign_tpu: a TPU-native parallel-speech mining framework.

A from-scratch JAX/XLA/Pallas rebuild of the Speech-Vecalign pipeline
(reference: mct10/Speech-Vecalign): monotonic alignment of parallel speech
documents via speech-segment embeddings, with no transcription.

Subpackages
-----------
- ``ops``        : TPU compute kernels (cost matmuls, wavefront DP, top-k, fbank)
- ``vecalign``   : coarse-to-fine aligner driver, traceback, scorer
- ``models``     : JAX speech models (VAD, LASER-style encoder, SONAR-style encoder)
- ``parallel``   : device-mesh / sharding helpers and host-level sharding
- ``preprocess`` : stage CLIs - VAD segmentation, untranslated-segment detection
- ``seg_align``  : stage CLIs - overlap concatenation, embedding, alignment
- ``postprocess``: stage CLIs - filters, concatenation, indexing, margin scoring
- ``utils``      : file/audio/embedding IO matching the reference data contract
"""

__version__ = "0.1.0"
