import torch.nn as nn

BN_MODULE_TYPES = (nn.BatchNorm1d, nn.BatchNorm2d, nn.BatchNorm3d,
                   nn.SyncBatchNorm)


def get_bn_modules(model):
    return [m for m in model.modules() if m.training
            and isinstance(m, BN_MODULE_TYPES)]


def update_bn_stats(model, data_loader, num_iters=200, progress=None):
    pass
