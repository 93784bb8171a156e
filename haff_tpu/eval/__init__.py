from .metrics import (  # noqa: F401
    hausdorff,
    iocm,
    iocm_batch,
    iou,
    iou_batch,
    threshold_sweep,
    union_metrics,
)
