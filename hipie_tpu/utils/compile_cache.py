"""Persistent XLA compilation cache.

ViT-H / full-train-step programs take minutes to compile; enabling JAX's
persistent cache makes restarts (resume-after-preemption, eval re-runs,
repeated benches) skip compilation entirely. Called by every CLI entry point
(tools/train_net.py, tools/eval_net.py, bench.py, __graft_entry__).

The reference has no analog (PyTorch eager pays no compile cost); this is the
TPU-native counterpart of "fast restart" in the checkpoint/resume story.
"""

from __future__ import annotations

import os


def enable_compilation_cache(directory: str | None = None) -> None:
    """Idempotently enable the persistent compile cache (safe on CPU too)."""
    import jax

    d = directory or os.environ.get("HIPIE_COMPILE_CACHE",
                                    "/tmp/hipie_compile_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax without the knobs: compilation still works, uncached
