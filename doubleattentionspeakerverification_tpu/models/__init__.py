from .classifier import (
    ModelState,
    get_alignments,
    get_embedding,
    init_speaker_classifier,
    speaker_classifier_apply,
)
from .vgg import vgg_apply, vgg_output_dim

__all__ = [
    "ModelState",
    "get_alignments",
    "get_embedding",
    "init_speaker_classifier",
    "speaker_classifier_apply",
    "vgg_apply",
    "vgg_output_dim",
]
