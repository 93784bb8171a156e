from . import ops  # noqa: F401
from .orchestrate import (  # noqa: F401
    FrameRecord,
    PipelineStages,
    expand_taxonomy,
    filter_record,
    mask_to_contours,
    pack_shard,
    run_pipeline,
    sam_mask_completion,
)
