"""Persistent XLA compilation cache for long-compile TPU sessions.

Large Pallas graphs (the batched hash engines) take 10-60 min in the
remote compiler (CLAUDE.md, round 3); every fresh process pays it again
because no persistent cache is configured.  jax's on-disk compilation
cache serializes compiled executables keyed by (HLO, compile options,
jaxlib version); if the backend supports executable serialization, a
second process skips the remote compile entirely.  If it doesn't (some
PJRT plugins refuse), jax logs a warning and runs exactly as before —
enabling it is strictly non-regressive, so every TPU-facing entry point
(bench.py, __graft_entry__.py, the CLI mains via cli/bootstrap.py, and
tools/*) calls this first.

Reference analog: torch's CUDA kernels are AOT-compiled at pip-install
time (ngp-ours/gridencoder/setup.py), so the reference never pays a
per-process compile; this is the JAX-native equivalent.
"""

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(path: str = "") -> bool:
    """Turn on jax's persistent compilation cache. Returns True if the
    config took (the cache may still be bypassed per-executable if the
    runtime can't serialize — that's logged by jax, not an error)."""
    import jax

    path = path or os.environ.get("FLNERF_JAX_CACHE", _DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        # set thresholds first, dir last: a partial failure then leaves
        # the cache fully OFF rather than half-configured
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_compilation_cache_dir", path)
        return True
    except Exception as e:
        # a silently-disabled cache costs 10-60 min per fresh Pallas
        # graph — make the failure diagnosable
        import sys
        print(f"[flnerf] persistent compile cache DISABLED: {e!r}",
              file=sys.stderr, flush=True)
        return False


def cache_entries(path: str = "") -> int:
    """Number of serialized executables currently in the cache dir —
    recorded in bench artifacts so 'cold start' compile timings are
    interpretable (a warm cache makes them near-zero)."""
    path = path or os.environ.get("FLNERF_JAX_CACHE", _DEFAULT_DIR)
    try:
        return len(os.listdir(path))
    except OSError:
        return 0
