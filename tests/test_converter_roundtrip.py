"""Full-model converter round-trip: export -> convert must reproduce the tree.

This is the strongest whole-checkpoint converter exercise available without a
released HIPIE .pth (none ships in this no-egress environment; see
tests/test_parity_real_weights.py for the gated real-weights path). It walks
the ENTIRE HIPIEModel parameter tree through utils/export (reference torch
naming + layouts) and back through utils/hipie_converter, asserting

  * every parameter is covered (coverage_report: nothing missing, no shape
    mismatches) modulo an explicit, justified allowlist, and
  * every mapped leaf is numerically identical (layout transforms invert
    exactly).

A converter or model-tree rename that silently breaks real-checkpoint loading
now fails here instead of at .pth time.
"""

import numpy as np
import pytest

import jax

from hipie_tpu.config import tiny_test_config
from hipie_tpu.models.hipie import HIPIEModel
from hipie_tpu.utils.export import export_hipie_checkpoint
from hipie_tpu.utils.hipie_converter import (convert_hipie_checkpoint,
                                             coverage_report)

# Parameters with no counterpart in reference checkpoints, by design:
#   pos-embed/bucket tables etc. should NOT appear here — extend only with a
#   reason.
ALLOWED_MISSING_SUBSTRINGS = (
)


def _flat(tree):
    return {
        "/".join(str(getattr(k, "key", k)) for k in kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


@pytest.fixture(scope="module")
def tiny_params():
    import jax.numpy as jnp
    cfg = tiny_test_config()
    model = HIPIEModel(cfg.model)
    b, H, W, L = 1, 64, 64, 16
    images = jnp.zeros((b, H, W, 3))
    pad = jnp.zeros((b, H, W), bool)
    ids = jnp.arange(L)[None].astype(jnp.int32) % 16
    am = jnp.ones((b, L), jnp.int32)
    sizes = jnp.array([[H, W]])
    params = jax.jit(model.init)(jax.random.PRNGKey(3), images, pad, ids, am,
                                 sizes)
    return cfg, params


def test_roundtrip_full_tree(tiny_params):
    cfg, params = tiny_params
    sd = export_hipie_checkpoint(jax.device_get(params)["params"], cfg)
    assert len(sd) > 100
    converted = convert_hipie_checkpoint(sd, cfg)
    rep = coverage_report(sd, converted, params)

    missing = [m for m in rep["missing_in_converted"]
               if not any(s in m for s in ALLOWED_MISSING_SUBSTRINGS)]
    assert not rep["shape_mismatches"], rep["shape_mismatches"][:10]
    assert not missing, f"{len(missing)} unmapped params, e.g. {missing[:15]}"

    flat_conv = _flat(converted)
    flat_params = _flat(jax.device_get(params))
    for k, v in flat_conv.items():
        assert k in flat_params, k
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flat_params[k]), err_msg=k)


def test_roundtrip_nonshared_pixel_decoder():
    """shared_encoder=False adds the MaskDINO pixel-decoder deformable encoder
    (scanned 'enc_layers' stack) — its export path regressed once (advisor r1
    medium finding): keep the full round-trip exercised for this mode too."""
    import jax.numpy as jnp
    from hipie_tpu.config import apply_overrides
    cfg = apply_overrides(tiny_test_config(),
                          {"model.maskdino.shared_encoder": False})
    model = HIPIEModel(cfg.model)
    b, H, W, L = 1, 64, 64, 16
    params = jax.jit(model.init)(
        jax.random.PRNGKey(5), jnp.zeros((b, H, W, 3)),
        jnp.zeros((b, H, W), bool), jnp.arange(L)[None].astype(jnp.int32) % 16,
        jnp.ones((b, L), jnp.int32), jnp.array([[H, W]]))
    sd = export_hipie_checkpoint(jax.device_get(params)["params"], cfg)
    assert any("pixel_decoder.transformer.encoder" in k for k in sd), \
        "pixel-decoder encoder weights missing from export"
    converted = convert_hipie_checkpoint(sd, cfg)
    rep = coverage_report(sd, converted, params)
    assert not rep["shape_mismatches"], rep["shape_mismatches"][:10]
    assert not rep["missing_in_converted"], rep["missing_in_converted"][:15]
    flat_conv = _flat(converted)
    flat_params = _flat(jax.device_get(params))
    for k, v in flat_conv.items():
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(flat_params[k]), err_msg=k)


def test_roundtrip_is_exact_twice(tiny_params):
    """export(convert(export(p))) == export(p): transforms are involutive."""
    cfg, params = tiny_params
    p0 = jax.device_get(params)["params"]
    sd1 = export_hipie_checkpoint(p0, cfg)
    converted = convert_hipie_checkpoint(sd1, cfg)
    sd2 = export_hipie_checkpoint(converted["params"], cfg)
    assert set(sd1) == set(sd2)
    for k in sd1:
        np.testing.assert_array_equal(sd1[k], sd2[k], err_msg=k)
