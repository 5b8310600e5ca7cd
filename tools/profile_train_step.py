"""Ablation profile of the jitted train step on the real TPU (synthetic batch).

Finds where train-step time goes: run `python tools/profile_train_step.py
full no_maskdino no_dn points64 ...`. Distinct rng per iteration; forces a
host transfer per measurement (tunnel: block_until_ready does not sync).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_batch(cfg, rng):
    import jax.numpy as jnp
    from hipie_tpu.losses.criterion import Targets
    from hipie_tpu.train.step import TrainBatch

    B = cfg.solver.ims_per_batch
    H = W = cfg.data.crop_size
    L = cfg.data.max_text_len
    N = cfg.model.max_insts_num
    s4 = H // 4
    n_real = 6
    labels = rng.randint(0, 5, (B, N))
    boxes = rng.uniform(0.2, 0.6, (B, N, 4))
    masks = rng.rand(B, N, s4, s4) > 0.7
    pm = np.zeros((B, N, L), np.float32)
    pm[:, :, 1] = 1.0
    valid = np.zeros((B, N), bool)
    valid[:, :n_real] = True
    t = Targets(
        labels=jnp.asarray(labels, jnp.int32),
        boxes=jnp.asarray(boxes, jnp.float32),
        masks=jnp.asarray(masks),
        positive_map=jnp.asarray(pm),
        is_thing=jnp.asarray(np.tile([True] * 4 + [False], (B, N // 5))[:, :N]),
        valid=jnp.asarray(valid),
    )
    return TrainBatch(
        images=jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255),
        pad_mask=jnp.zeros((B, H, W), bool),
        input_ids=jnp.asarray(rng.randint(6, 40, (B, L)), jnp.int32),
        lang_mask=jnp.ones((B, L), jnp.int32),
        image_sizes=jnp.asarray([[H, W]] * B, jnp.int32),
        targets=t,
    )


def run(tag, edits, iters=3):
    import jax
    from hipie_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    from hipie_tpu.config import apply_overrides, load_config
    from hipie_tpu.models.hipie import HIPIEModel
    from hipie_tpu.train.step import create_train_state, make_train_step

    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "configs", "smoke_tiny_coco.yaml"))
    if edits:
        cfg = apply_overrides(cfg, edits)
    model = HIPIEModel(cfg.model)
    rng = np.random.RandomState(0)
    batch = make_batch(cfg, rng)
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), batch)
    step = make_train_step(model, cfg, tx)

    key = jax.random.PRNGKey(1)
    t_c0 = time.perf_counter()
    state, m = step(state, batch, key)
    _ = float(np.asarray(m["total_loss"]))
    compile_s = time.perf_counter() - t_c0

    batches = [make_batch(cfg, np.random.RandomState(i + 1))
               for i in range(iters)]
    t0 = time.perf_counter()
    for i, b in enumerate(batches):
        key, k = jax.random.split(key)
        state, m = step(state, b, k)
        _ = float(np.asarray(m["total_loss"]))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag:28s} {dt * 1000:10.0f} ms/step   (first call {compile_s:.0f}s)",
          flush=True)
    return dt


if __name__ == "__main__":
    which = sys.argv[1:] or ["full"]
    variants = {
        "full": {},
        "no_maskdino": {"model.maskdino.enabled": False},
        "no_dn": {"model.dn.enabled": False},
        "points64": {"model.loss.num_points": 64},
        "ota": {"model.loss.matcher": "ota"},
        "no_unc": {"model.loss.importance_sample_ratio": 0.0},
        "oversample1": {"model.loss.oversample_ratio": 1.0},
        "points2048": {"model.loss.num_points": 2048},
        "insts20": {"model.max_insts_num": 20},
        "no_md_no_dn": {"model.maskdino.enabled": False,
                        "model.dn.enabled": False},
        "fwd_scale": {"solver.max_iter": 1},   # placeholder
        "prod1024": {"data.crop_size": 1024, "solver.ims_per_batch": 1,
                     "data.max_text_len": 128, "model.text.max_query_len": 128},
        "prod1024_approx": {"data.crop_size": 1024, "solver.ims_per_batch": 1,
                            "data.max_text_len": 128,
                            "model.text.max_query_len": 128,
                            "model.loss.exact_topk": False},
        "prod1024_b2": {"data.crop_size": 1024, "solver.ims_per_batch": 2,
                        "data.max_text_len": 128,
                        "model.text.max_query_len": 128},
        # VERDICT item 6: ViT-H production-scale train step (vit_huge_32g.yaml
        # geometry: 1024^2 LSJ, batch 1/chip, remat on backbone+transformer)
        "vith1024": {"data.crop_size": 1024, "solver.ims_per_batch": 1,
                     "data.max_text_len": 128, "model.text.max_query_len": 128,
                     "model.backbone.name": "vit_huge",
                     "model.backbone.vit_remat": True,
                     "model.transformer.remat": True,
                     # bf16 first moment: the ~740M-param state (f32 params
                     # + m + v = 8.9G) barely leaves room for the step's HLO
                     # temps on one 16G chip; bf16 m frees ~1.5G.
                     "solver.mu_dtype": "bfloat16"},
    }
    for tag in which:
        try:
            if tag == "auction50":
                # diagnostic: cap the auction while_loop trip count
                import hipie_tpu.losses.matcher as M
                M.auction_assignment.__defaults__ = (1e-3, 50)
                run(tag, {})
                M.auction_assignment.__defaults__ = (1e-3, 2000)
            else:
                run(tag, variants[tag])
        except Exception as e:
            print(f"{tag:28s} FAILED: {type(e).__name__}: {e}", flush=True)
