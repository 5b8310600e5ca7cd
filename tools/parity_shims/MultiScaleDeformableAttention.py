"""Stub for the reference's compiled MSDA CUDA extension: pure-pytorch
forward/backward with the exact semantics of the CUDA kernel (the reference
ships the same math as its own CPU fallback, ms_deform_attn_func.py:43-63 —
bilinear grid_sample per level with zero padding, align_corners=False).
"""
import torch
import torch.nn.functional as F


def _core(value, value_spatial_shapes, sampling_locations, attention_weights):
    N_, S_, M_, D_ = value.shape
    _, Lq_, M_, L_, P_, _ = sampling_locations.shape
    value_list = value.split([int(H_) * int(W_)
                              for H_, W_ in value_spatial_shapes], dim=1)
    sampling_grids = 2 * sampling_locations - 1
    sampling_value_list = []
    for lid_, (H_, W_) in enumerate(value_spatial_shapes):
        v_l = value_list[lid_].flatten(2).transpose(1, 2).reshape(
            N_ * M_, D_, int(H_), int(W_))
        grid_l = sampling_grids[:, :, :, lid_].transpose(1, 2).flatten(0, 1)
        sampled = F.grid_sample(v_l, grid_l, mode="bilinear",
                                padding_mode="zeros", align_corners=False)
        sampling_value_list.append(sampled)
    attention_weights = attention_weights.transpose(1, 2).reshape(
        N_ * M_, 1, Lq_, L_ * P_)
    output = (torch.stack(sampling_value_list, dim=-2).flatten(-2)
              * attention_weights).sum(-1).view(N_, M_ * D_, Lq_)
    return output.transpose(1, 2).contiguous()


def ms_deform_attn_forward(value, spatial_shapes, level_start_index,
                           sampling_locations, attention_weights, im2col_step):
    return _core(value, spatial_shapes, sampling_locations, attention_weights)


def ms_deform_attn_backward(*args, **kwargs):
    raise NotImplementedError(
        "use torch autograd through the pure forward for CPU parity")
