"""Config-bisection profile of ViT-H panoptic inference on the real TPU.

Times the full pipeline and ablated variants with distinct inputs per
iteration; differences attribute time to components. See PERFORMANCE.md.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(tag, cfg_edit, iters=5, size=1024):
    import jax
    import jax.numpy as jnp
    from hipie_tpu.config import apply_overrides
    from hipie_tpu.presets import vit_huge_coco_panoptic
    from hipie_tpu.models.hipie import HIPIEModel, hipie_inference
    from hipie_tpu.models.postprocess import ClassMaps

    cfg = vit_huge_coco_panoptic()
    if cfg_edit:
        cfg = apply_overrides(cfg, cfg_edit)
    L = cfg.model.text.max_query_len
    model = HIPIEModel(cfg.model)
    pad = jnp.zeros((1, size, size), bool)
    ids = jnp.asarray((np.arange(L) % 1000 + 999)[None], jnp.int32)
    am = jnp.ones((1, L), jnp.int32)
    sizes = jnp.asarray([[size, size]], jnp.int32)
    img0 = jnp.full((1, size, size, 3), 127.0, jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img0, pad, ids, am, sizes)

    C = 133
    mw = np.zeros((C, L), np.float32); tm = np.zeros((C, L), bool)
    for c in range(C):
        mw[c, (c % (L - 2)) + 1] = 1.0; tm[c, (c % (L - 2)) + 1] = True
    maps = ClassMaps(jnp.asarray(mw), jnp.asarray(tm), jnp.asarray(np.arange(C) < 80))

    @jax.jit
    def fn(params, images):
        out = model.apply(params, images, pad, ids, am, sizes)
        return hipie_inference(out, maps, cfg.test, cfg.model,
                               pad_mask_s4=pad[0][::4, ::4])

    rng = np.random.RandomState(0)
    ins = [jnp.asarray(rng.uniform(0, 255, (1, size, size, 3)).astype(np.float32))
           for _ in range(iters)]
    r = fn(params, img0)
    _ = jax.device_get(jax.tree.map(lambda x: x.sum() if hasattr(x, 'sum') else x,
                                    jax.tree.leaves(r)[0]))
    t0 = time.perf_counter()
    for im in ins:
        r = fn(params, im)
        _ = jax.device_get(jax.tree.leaves(r)[0].sum())
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{tag:40s} {dt:8.1f} ms/img", flush=True)
    return dt


if __name__ == "__main__":
    import sys
    which = sys.argv[1:] or ["full"]
    variants = {
        "full": {},
        "no_maskdino": {"model.maskdino.enabled": False},
        "enc1": {"model.transformer.num_encoder_layers": 1},
        "dec1": {"model.transformer.num_decoder_layers": 1},
        "resnet": {"model.backbone.name": "resnet50",
                   "model.backbone.vit_remat": False},
        "enc_points1": {"model.transformer.enc_n_points": 1},
    }
    for tag in which:
        try:
            run(tag, variants[tag])
        except Exception as e:  # keep profiling the rest
            print(f"{tag:40s} FAILED: {type(e).__name__}: {e}", flush=True)
