"""ViTDet backbone scan regression tests.

Regression: the scan body's drop-path divided the bf16 residual by the traced
f32 keep-probability (the per-block rate is a scanned f32 array), promoting
the carry to f32 — "scan carry input and output must have equal types" at
trace time for any bf16 train-mode config with drop_path > 0 (the ViT-H
production recipe, reference configs/training/vit_huge_32g.yaml DROP_PATH 0.5).
Caught by the vith1024 train-step profile on real TPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hipie_tpu.models.backbone.vit import ViTDet


def _tiny(dtype, drop_path):
    return ViTDet(
        img_size=32, embed_dim=64, depth=4, num_heads=2,
        drop_path_rate=drop_path, window_size=2, window_block_indexes=(0, 1),
        dtype=dtype)


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_vit_train_mode_drop_path_keeps_carry_dtype(dtype):
    m = _tiny(dtype, drop_path=0.5)
    x = jnp.ones((1, 32, 32, 3), dtype)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    v = m.init(rngs, x, deterministic=False)
    out = m.apply(v, x, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(2)})
    for name, o in out.items():
        assert o.dtype == dtype, (name, o.dtype)
        assert bool(jnp.isfinite(o.astype(jnp.float32)).all()), name


def test_vit_drop_path_zero_rate_is_identity_vs_eval():
    # rate scanned as 0.0 for every block: train-mode forward must equal the
    # deterministic forward exactly (the rescale math must be a no-op).
    m = _tiny(jnp.float32, drop_path=0.0)
    x = jnp.linspace(0, 1, 32 * 32 * 3, dtype=jnp.float32).reshape(1, 32, 32, 3)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    v = m.init(rngs, x, deterministic=True)
    a = m.apply(v, x, deterministic=True)
    b = m.apply(v, x, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(2)})
    for name in a:
        np.testing.assert_array_equal(np.asarray(a[name]), np.asarray(b[name]))
