"""Tracing / profiling / debugging helpers (SURVEY.md §5 tracing).

The reference instruments with wall-clock prints (Vent_Analysis.py:318,333;
CI.py:122-143).  Here:
- `trace(profile_dir)` wraps a block in jax.profiler (TensorBoard/Perfetto
  traces) when a directory is given;
- `stage(name)` adds jax.named_scope annotations so pipeline stages are
  visible in traces;
- `timed(name)` measures honest wall time (forces a host sync — see
  axon platform note in bench.py);
- `enable_debug_checks()` turns on NaN/Inf interception for tests
  (the sanitizer analog, SURVEY.md §5 race detection).
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(profile_dir: Optional[str]) -> Iterator[None]:
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def stage(name: str):
    """jax.named_scope alias for pipeline stage annotation."""
    return jax.named_scope(name)


@contextlib.contextmanager
def timed(name: str, sink=print) -> Iterator[None]:
    t0 = time.perf_counter()
    yield
    sink(f"[ventjax] {name}: {time.perf_counter() - t0:.3f}s")


def sync(tree) -> None:
    """Force device work to finish (host transfer of one leaf; the axon
    platform's block_until_ready is unreliable)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(leaves[0]).ravel()[:1]


def enable_debug_checks(nans: bool = True, infs: bool = True) -> None:
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)


def enable_deterministic() -> None:
    """Bitwise-deterministic XLA reductions (--deterministic flag analog)."""
    import os
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_gpu_deterministic" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_cpu_enable_fast_math=false"
        ).strip()


def enable_compile_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Persistent XLA compilation cache (jax_compilation_cache_dir).

    Compile latency on this platform is minutes-scale for the fused
    pipeline (docs/PERF.md), and every CLI invocation is a fresh process —
    without a persistent cache each one pays the full compile.  Measured
    here (axon, 512x512 jit): 11.7s cold -> 1.2s from cache.

    Default location: $VENTJAX_CACHE_DIR, else ~/.cache/ventjax/xla.
    Set VENTJAX_NO_CACHE=1 (or pass the CLI --no-compile-cache flag, which
    simply skips this call) to disable.  Returns the directory in use, or
    None when disabled.
    """
    import os

    if os.environ.get("VENTJAX_NO_CACHE"):
        return None
    cache_dir = (cache_dir or os.environ.get("VENTJAX_CACHE_DIR")
                 or os.path.join(os.path.expanduser("~"), ".cache",
                                 "ventjax", "xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    try:
        # the cache backend initializes lazily ONCE; if something already
        # compiled in this process, re-point it at the new directory
        from jax.experimental.compilation_cache import compilation_cache

        compilation_cache.reset_cache()
    except Exception:
        pass  # pre-first-compile (the CLI path) needs no reset
    # cache every program: the pipeline is few large jits, and even small
    # helper programs cost seconds through the remote compile service
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
