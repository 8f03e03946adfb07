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
