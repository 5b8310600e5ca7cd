#!/usr/bin/env python
"""Training/eval CLI (reference: projects/HIPIE/train_net.py + root launch.py).

Usage:
  python tools/train_net.py --config-file configs/r50.yaml [--eval-only]
      [--num-devices N] [--tp T] [KEY VALUE ...]

No process launcher is needed (the reference spawns one proc per GPU via
launch.py / mp.spawn): a single JAX SPMD program drives the whole mesh.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", default="")
    p.add_argument("--preset", default="r50_coco_panoptic")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--weights", default="")
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--vocab", default="", help="bert vocab.txt path")
    p.add_argument("--log-period", type=int, default=20)
    p.add_argument("--no-eval", action="store_true",
                   help="disable eval-during-training (EvalHook)")
    p.add_argument("--tensorboard", action="store_true",
                   help="mirror metrics to <output_dir>/tb (reference: "
                        "TensorboardXWriter + wandb sync_tensorboard)")
    p.add_argument("opts", nargs="*", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from hipie_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from hipie_tpu import presets
    from hipie_tpu.config import apply_overrides, load_config
    from hipie_tpu.data.mapper import HIPIEMapper
    from hipie_tpu.data.loader import TrainLoader
    from hipie_tpu.models.hipie import HIPIEModel
    from hipie_tpu.models.text.tokenizer import WordPieceTokenizer
    from hipie_tpu.parallel.mesh import create_mesh, shard_params
    from hipie_tpu.train.step import (TrainBatch, create_train_state,
                                      make_train_step)
    from hipie_tpu.train.trainer import Trainer
    from hipie_tpu.evaluation.evaluator import make_inline_eval_fn

    cfg = (load_config(args.config_file) if args.config_file
           else getattr(presets, args.preset)())
    overrides = dict(zip(args.opts[::2], args.opts[1::2]))
    if overrides:
        cfg = apply_overrides(cfg, overrides)

    tok = (WordPieceTokenizer.from_vocab_file(args.vocab) if args.vocab
           else WordPieceTokenizer.toy())
    model = HIPIEModel(cfg.model)
    mapper = HIPIEMapper(cfg.data, tok, is_train=not args.eval_only,
                         max_gt=cfg.model.max_insts_num, seed=cfg.seed)

    mesh = create_mesh(tp=args.tp)
    # The GLOBAL batch is sharded over the mesh's DATA axis only (the tp axis
    # sees the same examples); each process loads its own shard of the batch.
    dp = mesh.shape["data"]
    n_proc = jax.process_count()
    global_batch = max(cfg.solver.ims_per_batch // dp, 1) * dp
    per_host = global_batch // n_proc
    loader = TrainLoader(cfg.data, mapper, per_host, seed=cfg.seed,
                         shard_rank=jax.process_index(), num_shards=n_proc)

    with jax.set_mesh(mesh):
        from hipie_tpu.parallel.mesh import batch_sharding
        bsh = batch_sharding(mesh)
        _, first = next(iter(loader))
        first = jax.device_put(TrainBatch(**first), bsh)
        state, tx = create_train_state(model, cfg, jax.random.PRNGKey(cfg.seed),
                                       first)
        state = state._replace(
            params=jax.device_put(state.params, shard_params(state.params, mesh)))
        # one jitted step per task present in the training mix (reference
        # train_net.py:110-164 routes the forward/loss task by dataset;
        # batches are dataset-homogeneous so dispatch is per batch).
        steps = {t: make_train_step(model, cfg, tx, task=t)
                 for t in sorted(set(loader.tasks))}
        eval_fn = (make_inline_eval_fn(cfg, model, tok)
                   if cfg.test.eval_period > 0 and not args.no_eval else None)
        trainer = Trainer(cfg, model, state, tx, steps, loader,
                          eval_fn=eval_fn,
                          batch_sharding=bsh, log_period=args.log_period)
        if args.tensorboard:
            trainer.storage.enable_tensorboard()
        trainer.resume_or_load(args.weights or None, resume=args.resume)
        if args.eval_only:
            raise SystemExit("use tools/eval_net.py for evaluation")
        trainer.train()


if __name__ == "__main__":
    main()
