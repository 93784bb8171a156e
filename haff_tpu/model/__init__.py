from .lisa import LisaModel, LisaOutputs, TrainBatch  # noqa: F401
from .multimodal import (  # noqa: F401
    find_image_position,
    gather_seg_embeddings,
    splice_image_embeddings,
)
