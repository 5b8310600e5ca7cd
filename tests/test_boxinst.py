"""BoxInst loss ops vs torch reference semantics (unfold_wo_center, color
similarity, pairwise term — hipie_img.py:1056-1097, deformable_detr.py:881-920)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.fast  # curated inner-loop tier (tests/conftest.py)


def _unfold_wo_center(x, kernel_size, dilation):
    import torch.nn.functional as F
    padding = (kernel_size + (dilation - 1) * (kernel_size - 1)) // 2
    u = F.unfold(x, kernel_size=kernel_size, padding=padding, dilation=dilation)
    u = u.reshape(x.size(0), x.size(1), -1, x.size(2), x.size(3))
    size = kernel_size ** 2
    import torch
    return torch.cat((u[:, :, :size // 2], u[:, :, size // 2 + 1:]), dim=2)


def test_shift_stack_matches_unfold():
    import torch
    from hipie_tpu.losses.boxinst import shift_stack

    rng = np.random.RandomState(0)
    img = rng.rand(1, 3, 12, 10).astype(np.float32)
    ref = _unfold_wo_center(torch.from_numpy(img), 3, 2).numpy()[0]
    got = np.asarray(shift_stack(jnp.asarray(img[0]), 3, 2))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_pairwise_term_matches_torch():
    import torch
    import torch.nn.functional as F
    from hipie_tpu.losses.boxinst import pairwise_term

    rng = np.random.RandomState(1)
    ml = rng.randn(2, 1, 12, 10).astype(np.float32)
    t = torch.from_numpy(ml)
    log_fg = F.logsigmoid(t)
    log_bg = F.logsigmoid(-t)
    fg_u = _unfold_wo_center(log_fg, 3, 2)
    bg_u = _unfold_wo_center(log_bg, 3, 2)
    sf = log_fg[:, :, None] + fg_u
    sb = log_bg[:, :, None] + bg_u
    m = torch.max(sf, sb)
    ref = -(torch.log(torch.exp(sf - m) + torch.exp(sb - m)) + m)[:, 0].numpy()
    got = np.asarray(pairwise_term(jnp.asarray(ml[:, 0]), 3, 2))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_boxinst_losses_run():
    from hipie_tpu.losses.boxinst import boxinst_losses, images_color_similarity

    rng = np.random.RandomState(2)
    n, h, w = 3, 16, 16
    ml = jnp.asarray(rng.randn(n, h, w).astype(np.float32))
    boxes = np.zeros((n, h, w), np.float32)
    boxes[:, 4:12, 4:12] = 1
    sim = jnp.stack([images_color_similarity(
        jnp.asarray(rng.rand(h, w, 3).astype(np.float32))) for _ in range(n)])
    out = boxinst_losses(ml, jnp.asarray(boxes), sim,
                         jnp.asarray([True, True, False]),
                         jnp.asarray(20000))
    assert np.isfinite(float(out["loss_prj"]))
    assert np.isfinite(float(out["loss_pairwise"]))
