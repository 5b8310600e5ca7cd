"""Benchmark: ViT-H COCO-panoptic inference throughput (images/sec/chip).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference repo publishes no throughput (BASELINE.md). We use an
estimated A100 reference of 1.5 images/sec for HIPIE ViT-H 1024^2 panoptic
inference (ViT-H backbone ~3.3 TFLOP/img + deformable encoder/decoder + mask
heads, torch fp16 on A100); `vs_baseline` = measured / 1.5. The north-star is
vs_baseline >= 3.0 (BASELINE.json).
"""

import json
import os
import time

import numpy as np


def main():
    import jax

    from hipie_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    size = int(os.environ.get("BENCH_SIZE", "1024"))
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    from hipie_tpu.presets import vit_huge_coco_panoptic
    from hipie_tpu.models.hipie import HIPIEModel, hipie_inference
    from hipie_tpu.models.postprocess import ClassMaps

    cfg = vit_huge_coco_panoptic()
    L = cfg.model.text.max_query_len
    model = HIPIEModel(cfg.model)
    images = jnp.full((batch, size, size, 3), 127.0, jnp.float32)
    pad = jnp.zeros((batch, size, size), bool)
    ids = jnp.asarray((np.arange(L) % 1000 + 999)[None].repeat(batch, 0), jnp.int32)
    am = jnp.ones((batch, L), jnp.int32)
    sizes = jnp.asarray([[size, size]] * batch, jnp.int32)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, pad, ids, am, sizes)

    if os.environ.get("BENCH_CAST_BF16", "1") == "1":
        from hipie_tpu.utils.misc import cast_params_bf16
        params = cast_params_bf16(params)

    C = 133
    mw = np.zeros((C, L), np.float32)
    tm = np.zeros((C, L), bool)
    for c in range(C):
        mw[c, (c % (L - 2)) + 1] = 1.0
        tm[c, (c % (L - 2)) + 1] = True
    maps = ClassMaps(jnp.asarray(mw), jnp.asarray(tm),
                     jnp.asarray(np.arange(C) < 80))

    # The 133-class COCO prompt is fixed across images: encode it ONCE and
    # replicate (BASELINE.json: "class-prompt text embeddings precomputed and
    # replicated"). BENCH_TEXT=inline reverts to per-image BERT encoding.
    if os.environ.get("BENCH_TEXT") == "inline":
        hidden = None
    else:
        hidden = jax.jit(
            lambda p, i, a: model.apply(p, i, a, method=HIPIEModel.encode_text)
        )(params, ids, am)

    # hidden is a runtime argument (device-resident), not a closed-over
    # constant: closing over it embeds the embeddings in the HLO and lets XLA
    # constant-fold downstream language projections at compile time, measuring
    # less per-iteration work than the real predictor (ADVICE r03).
    @jax.jit
    def fn(params, hidden, images, pad, ids, am, sizes):
        out = model.apply(params, images, pad, ids, am, sizes,
                          lang_hidden=hidden)
        return hipie_inference(out, maps, cfg.test, cfg.model,
                               pad_mask_s4=pad[0][::4, ::4])

    # Distinct inputs per iteration: repeated same-input timing through the
    # device tunnel is unreliable (result caching) — see PERFORMANCE.md.
    # distinct inputs per RUN as well as per iteration: the tunneled device
    # caches (program, input) results across processes (PERFORMANCE.md)
    #
    # Inputs ship as uint8 (BENCH_INPUT=f32 to revert): pixels are uint8 at
    # the source and the model normalizes on device (HIPIEModel.normalize
    # casts), so uint8 is the production predictor input path — and it cuts
    # the per-image host->device tunnel transfer from 12.6 MB to 3.1 MB.
    in_dtype = np.float32 if os.environ.get("BENCH_INPUT") == "f32" else np.uint8
    rng = np.random.RandomState(int(time.time()) % 100000)
    inputs = [
        jnp.asarray(rng.uniform(0, 255, (batch, size, size, 3)).astype(in_dtype))
        for _ in range(iters)
    ]
    images = images.astype(in_dtype)

    def force(res):
        # On the tunneled platform block_until_ready may not synchronize
        # (PERFORMANCE.md): force a host transfer of one scalar instead.
        return float(np.asarray(jax.tree_util.tree_leaves(res)[0].sum()))

    # warmup/compile
    force(fn(params, hidden, images, pad, ids, am, sizes))
    t0 = time.perf_counter()
    for im in inputs:
        r = fn(params, hidden, im, pad, ids, am, sizes)
    force(r)
    dt = time.perf_counter() - t0
    ips = batch * iters / dt

    # The reference publishes no throughput; 1.5 img/s is our reference-
    # favorable estimate for torch-fp16 HIPIE ViT-H on A100 (BASELINE.md,
    # PERFORMANCE.md sensitivity analysis: plausible band 0.6-1.9 img/s, so
    # vs_baseline carries a x[value/1.9, value/0.6] band). ms_per_image is the
    # absolute-terms number that does not rest on the estimate.
    a100_baseline = 1.5
    print(json.dumps({
        "metric": "coco_panoptic_vith_images_per_sec_per_chip",
        "value": round(ips, 4),
        "unit": "images/sec",
        "vs_baseline": round(ips / a100_baseline, 4),
        "ms_per_image": round(1000.0 * dt / (batch * iters), 2),
        "vs_baseline_band": [round(ips / 1.9, 2), round(ips / 0.6, 2)],
        "baseline_note": "A100 ref estimated 1.5 img/s (band 0.6-1.9); "
                         "random-init weights (PQ parity argued via "
                         "PARITY_FULL.md noise-floor equivalence)",
    }))


if __name__ == "__main__":
    # The tunneled TPU backend can fail/hang transiently at init (BENCH_r02
    # died to exactly this). Retry a few times before giving up so a blip at
    # bench time doesn't zero out a round's perf evidence.
    attempts = int(os.environ.get("BENCH_INIT_RETRIES", "3"))
    for i in range(attempts):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001 - backend init errors vary
            if i == attempts - 1:
                raise
            import sys
            import traceback
            traceback.print_exc()
            print(f"bench attempt {i + 1}/{attempts} failed ({type(e).__name__}); "
                  f"retrying in 120 s", file=sys.stderr)
            time.sleep(120)
