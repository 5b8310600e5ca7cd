from fvcore.nn.focal_loss import (sigmoid_focal_loss,  # noqa: F401
                                  sigmoid_focal_loss_jit,
                                  sigmoid_focal_loss_star,
                                  sigmoid_focal_loss_star_jit)
from fvcore.nn.giou_loss import giou_loss  # noqa: F401
from fvcore.nn.smooth_l1_loss import smooth_l1_loss  # noqa: F401


def parameter_count(model):
    from collections import defaultdict
    counts = defaultdict(int)
    for name, p in model.named_parameters():
        counts[""] += p.numel()
        parts = name.split(".")
        for i in range(1, len(parts)):
            counts[".".join(parts[:i])] += p.numel()
    return counts


def parameter_count_table(model, max_depth=3):
    return str(dict(parameter_count(model)))


def flop_count(model, inputs, supported_ops=None):
    return {}, {}


def activation_count(model, inputs, supported_ops=None):
    return {}, {}


class FlopCountAnalysis:
    def __init__(self, model, inputs):
        self._model = model

    def total(self):
        return 0
