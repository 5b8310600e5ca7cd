"""Persistent XLA compilation cache.

ViT-H / full-train-step programs take minutes to compile; enabling JAX's
persistent cache makes restarts (resume-after-preemption, eval re-runs,
repeated benches) skip compilation entirely. Called by every CLI entry point
(tools/train_net.py, tools/eval_net.py, bench.py, __graft_entry__).

The reference has no analog (PyTorch eager pays no compile cost); this is the
TPU-native counterpart of "fast restart" in the checkpoint/resume story.
"""

from __future__ import annotations

import hashlib
import os


def _host_cpu_key() -> str:
    """Fingerprint of the host CPU's feature set AND the compile-affecting env.

    /tmp (and so the cache dir) survives across rounds on this platform, but
    the host VM does NOT necessarily: XLA:CPU AOT results compiled for one
    machine's feature set load on a host without them with an 'execution
    errors such as SIGILL' warning — observed in the round-2 bench/joint logs.

    The cpuinfo flags line alone proved insufficient: the SAME machine
    produces incompatible AOT results under different XLA_FLAGS (runs with
    the platform sitecustomize active compile with +prefer-no-gather /
    +prefer-no-scatter; runs without it don't — the loader treats those
    tuning prefs as machine features and warns about SIGILL). Include the
    XLA-relevant env in the key so each compile configuration gets its own
    cache subdir.
    """
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    parts.append(line)
                    break
    except OSError:
        import platform
        parts.append(platform.processor())
    parts.append(os.environ.get("XLA_FLAGS", ""))
    try:
        import jaxlib
        parts.append(getattr(jaxlib, "__version__", ""))
    except Exception:
        pass
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:10]


def enable_compilation_cache(directory: str | None = None) -> None:
    """Idempotently enable the persistent compile cache (safe on CPU too)."""
    import jax

    d = directory or os.environ.get("HIPIE_COMPILE_CACHE",
                                    "/tmp/hipie_compile_cache")
    # TPU entries target the accelerator, not the host — shared dir is fine.
    # CPU entries are host-machine code: isolate per host feature set.
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        d = os.path.join(d, f"cpu-{_host_cpu_key()}")
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax without the knobs: compilation still works, uncached
