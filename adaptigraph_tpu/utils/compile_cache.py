"""Persistent XLA compilation cache wiring.

Campaign processes pay multi-minute first compiles over the TPU tunnel on
every (re)start — and the hang watchdog restarts them (scripts/
run_granular_campaign.sh), so the same programs recompile repeatedly.
jax's persistent compilation cache keys on the serialized HLO + compile
options, so identical episode programs (caps are fixed per material —
scenes/build.py MATERIAL_CAPS) hit across processes.

Whether the cache captures anything under the axon remote backend depends
on where compilation runs; `enable_compile_cache()` is therefore best-
effort and safe to call unconditionally (falls back to no-op on error).
"""

from __future__ import annotations

import os

DEFAULT_DIR = "/root/repo/data/jax_cache"


def enable_compile_cache(cache_dir: str | None = None) -> bool:
    """Point jax at a persistent on-disk compilation cache. Returns True
    when the config was applied. Honors ADAPTIGRAPH_JAX_CACHE=0 to opt out."""
    if os.environ.get("ADAPTIGRAPH_JAX_CACHE", "1") == "0":
        return False
    cache_dir = cache_dir or os.environ.get("ADAPTIGRAPH_JAX_CACHE_DIR",
                                            DEFAULT_DIR)
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every program regardless of size/compile time: the tunnel
        # dispatch floor (~25-30 ms) already dwarfs cache lookup cost
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        return True
    except Exception:
        return False
