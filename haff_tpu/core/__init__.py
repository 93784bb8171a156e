from .config import (  # noqa: F401
    ClipVisionConfig,
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
    InferConfig,
    LlamaConfig,
    LoraConfig,
    MeshConfig,
    ModelConfig,
    SamDecoderConfig,
    SamEncoderConfig,
    SEG_TOKEN,
    TrainConfig,
)
from .mesh import build_mesh, shard, single_device_mesh, use_mesh  # noqa: F401
