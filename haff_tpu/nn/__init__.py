from .layers import ChannelLayerNorm, MLPBlock, ReluMLP  # noqa: F401
from .mask_decoder import MaskDecoder  # noqa: F401
from .prompt_encoder import PositionEmbeddingRandom, PromptEncoder  # noqa: F401
from .sam import Sam, preprocess_image  # noqa: F401
from .sam_image_encoder import SamImageEncoder  # noqa: F401
from .two_way_transformer import TwoWayTransformer  # noqa: F401
from .clip_vit import ClipVisionTower  # noqa: F401
from .llama import LlamaForCausalLM, RMSNorm  # noqa: F401
from .lora import LoraDense  # noqa: F401
from .mpt import MptConfig, MptForCausalLM  # noqa: F401
from .quant import make_quantized_apply, quantize_tree  # noqa: F401
