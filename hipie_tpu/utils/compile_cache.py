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
    errors such as SIGILL' warning — observed in the round-2 bench/joint logs,
    and the likeliest mechanism behind the round-3 8-device dryrun dying in a
    collective rendezvous timeout (one device thread wedged by a stale AOT
    program).

    The cpuinfo flags line alone proved insufficient: the SAME machine
    produces incompatible AOT results under different XLA_FLAGS (runs with
    the platform sitecustomize active compile with +prefer-no-gather /
    +prefer-no-scatter; runs without it don't — the loader treats those
    tuning prefs as machine features and warns about SIGILL). Include the
    XLA-relevant env in the key so each compile configuration gets its own
    cache subdir.

    Belt and braces, the key also includes the kernel boot_id: a CPU AOT
    entry can then never outlive the VM incarnation that compiled it, while
    re-runs within one boot (the case caching is for) still hit.
    """
    parts = []
    found_cpu = False
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    parts.append(line)
                    found_cpu = True
                    break
    except OSError:
        pass
    if not found_cpu:
        import platform
        parts.append(platform.processor())
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            parts.append(f.read().strip())
    except OSError:
        pass
    parts.append(os.environ.get("XLA_FLAGS", ""))
    try:
        import jaxlib
        parts.append(getattr(jaxlib, "__version__", ""))
    except Exception:
        pass
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:10]


def _resolved_platform() -> str:
    """The platform jax will actually use — jax.config wins over the env var.

    The env here exports JAX_PLATFORMS=axon (TPU tunnel) while the multichip
    dryrun and the test suite select CPU via jax.config.update("jax_platforms",
    "cpu"); keying on the env var alone left dryrun CPU AOT entries in the
    shared dir (the round-3 regression)."""
    try:
        import jax
        v = jax.config.jax_platforms
        if v:
            return v
    except Exception:
        pass
    return os.environ.get("JAX_PLATFORMS", "")


def enable_compilation_cache(directory: str | None = None) -> None:
    """Idempotently enable the persistent compile cache (safe on CPU too)."""
    import jax

    d = directory or os.environ.get("HIPIE_COMPILE_CACHE",
                                    "/tmp/hipie_compile_cache")
    # TPU entries target the accelerator, not the host — shared dir is fine.
    # CPU entries are host-machine code: isolate per host feature set + boot.
    if _resolved_platform().startswith("cpu"):
        d = os.path.join(d, f"cpu-{_host_cpu_key()}")
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax without the knobs: compilation still works, uncached
