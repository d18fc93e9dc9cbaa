"""Process-wide JAX configuration for the pipeline.

Every process that touches the device (modules, benches, tools) shares one
persistent compilation cache, so the multi-minute first compile of a module
chain through a remote-attached backend happens once per machine, not once
per process launch. The reference had no equivalent problem (OpenCV has no
compile step); on TPU the cache IS the startup-latency story.
"""

from __future__ import annotations

import os


def _host_fingerprint() -> str:
    """Short hash of this host's CPU ISA feature set."""
    import hashlib
    import platform

    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    return hashlib.sha1(
        (platform.machine() + ":" + flags).encode()
    ).hexdigest()[:12]


def _default_cache_dir() -> str:
    override = os.environ.get("CUAUV_JAX_CACHE")
    if override:
        return override
    # source checkout: keep the cache next to the code so repeated runs of
    # any tool in the repo share it
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo_root = os.path.dirname(pkg_dir)
    if os.path.isdir(os.path.join(repo_root, ".git")):
        base = os.path.join(repo_root, ".jax_cache")
    else:
        base = os.path.expanduser("~/.cache/cuauv-vision-pipeline-tpu/jax")
    # CPU-platform processes get a PER-MACHINE partition: XLA:CPU AOT
    # entries bake the COMPILE machine's vector ISA into the executable
    # while the cache key ignores host features, so a workspace cache
    # carried to a different host loads mismatched AOT code ("could lead
    # to SIGILL" per cpu_aot_loader — observed live as a module executor
    # hanging mid-soak). TPU entries are host-ISA-independent (device
    # code) and stay shared in the base dir.
    if os.environ.get("JAX_PLATFORMS", "").split(",")[0].strip() == "cpu":
        return os.path.join(base, "cpu-" + _host_fingerprint())
    return base


_configured = False


def apply_env_platform() -> None:
    """Honor ``$JAX_PLATFORMS`` even when a PJRT plugin force-selects its
    own platform at import time.

    On hosts whose device plugin (e.g. a remote-attached TPU) overrides the
    platform during jax init, the environment variable alone is ignored in
    freshly spawned processes; only an in-process ``jax.config.update``
    before backend initialization wins. This makes subprocess platform
    selection (module toggler on a CPU mesh, tests, CI) behave as
    documented. No-op once a backend is initialized or when the var is
    unset.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # backend already up; leave it be


def ensure_compile_cache() -> None:
    """Idempotently point JAX's persistent compilation cache at the shared
    directory. Call before the first jit dispatch (imports jax)."""
    global _configured
    if _configured:
        return
    import jax

    if getattr(jax.config, "jax_compilation_cache_dir", None):
        _configured = True  # respect an explicit setting (e.g. the test suite)
        return
    jax.config.update("jax_compilation_cache_dir", _default_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _configured = True
