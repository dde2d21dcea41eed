"""TPU-native speaker-verification framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
``fedecosta/DoubleAttentionSpeakerVerification`` (Double Multi-Head Attention
for Speaker Verification, arXiv:2007.13199): on-device log-mel front-end, VGG
conv encoders, attention-pooling family (single / multi-head / double
multi-head), AM-Softmax training with annealing, EER trial validation,
checkpoint/resume, and data/model-parallel scaling over TPU meshes.
"""

from .config import (
    DataConfig,
    ExperimentConfig,
    FeatureConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
    count_speakers,
)

__version__ = "0.1.0"

__all__ = [
    "DataConfig",
    "ExperimentConfig",
    "FeatureConfig",
    "MeshConfig",
    "ModelConfig",
    "TrainConfig",
    "count_speakers",
    "__version__",
]
