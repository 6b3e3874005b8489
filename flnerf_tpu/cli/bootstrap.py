"""Shared CLI startup: enable the persistent XLA compile cache before the
first trace so training CLIs — the processes that pay the 10-60 min
remote Pallas compiles (CLAUDE.md) — amortize them across runs."""

from flnerf_tpu.core.compile_cache import enable_compile_cache


def bootstrap() -> None:
    enable_compile_cache()
