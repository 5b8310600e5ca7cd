import torch.nn as nn


def roi_align(input, boxes, output_size, spatial_scale=1.0,
              sampling_ratio=-1, aligned=False):
    raise NotImplementedError("roi_align is not on the parity path")


class RoIAlign(nn.Module):
    def __init__(self, *a, **k):
        super().__init__()

    def forward(self, *a, **k):
        raise NotImplementedError("RoIAlign is not on the parity path")
