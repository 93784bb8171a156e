from .aff_dataset import AffDataset, AffDatasetVal, rasterize_contours  # noqa: F401
from .collate import Sample, collate_affordance, tokenize_conversation  # noqa: F401
from .prompts import ANSWER_LIST, SHORT_QUESTION_LIST, build_conversation  # noqa: F401
from .tokenizer import ByteTokenizer, load_tokenizer, tokenizer_image_token  # noqa: F401
from .transforms import clip_preprocess, sam_preprocess  # noqa: F401
