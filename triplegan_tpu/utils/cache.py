"""Persistent XLA compilation cache — compile once per program shape, ever.

The dev environment tunnels to the TPU with a large first-compile/handshake
latency, and production runs benefit identically: every jitted executable
(train step, eval step, sampler) is cached on disk keyed by its HLO, so
repeated launches skip compilation entirely.
"""

from __future__ import annotations

import os

import jax

_DEFAULT = os.path.expanduser("~/.cache/triplegan_tpu_xla")


def enable_compilation_cache(path: str | None = None) -> None:
    jax.config.update("jax_compilation_cache_dir", path or _DEFAULT)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
