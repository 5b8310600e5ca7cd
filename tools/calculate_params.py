#!/usr/bin/env python
"""Parameter counting / model size report (reference: tools_bin/calculate_param.py).

Usage: python tools/calculate_params.py [--preset vit_huge_coco_panoptic]
Prints a per-subtree parameter count table plus totals (fp32 MB).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="r50_coco_panoptic")
    p.add_argument("--depth", type=int, default=2,
                   help="tree depth to aggregate at")
    args = p.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp
    from hipie_tpu import presets
    from hipie_tpu.models.hipie import HIPIEModel

    cfg = getattr(presets, args.preset)()
    model = HIPIEModel(cfg.model)
    L = 8
    # input large enough that the encoder token count exceeds the two-stage
    # top-k (900 proposals)
    shapes = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)),
        jnp.zeros((1, 512, 512), bool), jnp.zeros((1, L), jnp.int32),
        jnp.ones((1, L), jnp.int32), jnp.asarray([[512, 512]], jnp.int32)))

    totals = {}
    for kp, leaf in jax.tree_util.tree_flatten_with_path(shapes)[0]:
        path = [str(getattr(k, "key", k)) for k in kp]
        group = "/".join(path[1:args.depth + 1])
        n = 1
        for s in leaf.shape:
            n *= s
        totals[group] = totals.get(group, 0) + n

    width = max(len(k) for k in totals)
    total = 0
    for k in sorted(totals, key=totals.get, reverse=True):
        print(f"{k:{width}s} {totals[k]:>14,d}  ({totals[k] * 4 / 2**20:8.1f} MB fp32)")
        total += totals[k]
    print("-" * (width + 40))
    print(f"{'TOTAL':{width}s} {total:>14,d}  ({total * 4 / 2**20:8.1f} MB fp32, "
          f"{total * 2 / 2**20:.1f} MB bf16)")


if __name__ == "__main__":
    main()
