from torchvision.ops.boxes import (batched_nms, box_area, box_iou,  # noqa: F401
                                   generalized_box_iou, nms)
from torchvision.ops.misc import FrozenBatchNorm2d  # noqa: F401
from torchvision.ops.roi_align import RoIAlign, roi_align  # noqa: F401


def deform_conv2d(*a, **k):
    raise NotImplementedError("deform_conv2d is not on the parity path")


class RoIPool:
    def __init__(self, *a, **k):
        raise NotImplementedError("RoIPool is not on the parity path")
