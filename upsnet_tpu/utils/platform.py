"""Platform selection helper.

Some environments ship a sitecustomize that pins JAX to a plugin backend
(e.g. a remote-TPU relay) regardless of JAX_PLATFORMS. Calling this before
any device use re-asserts the env var's request so CPU runs (tests, smoke
training, CI) actually run on CPU.
"""

from __future__ import annotations

import os


def honor_env_platform() -> None:
    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass  # backend already initialized; keep whatever it is
    enable_compile_cache()


def enable_compile_cache(path: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache for every entry point.

    The flagship programs take O(10 min) to compile on a single-core host
    (the reference amortized this as CUDA kernels compiled once at
    init.sh time — upsnet/operators/src; our XLA equivalent is this
    cache): a relaunched train/eval/bench run with unchanged shapes
    must not pay it twice. Opt out with UPSNET_NO_COMPILE_CACHE=1.
    """
    if os.environ.get("UPSNET_NO_COMPILE_CACHE"):
        return
    # Default-on for device backends only: XLA:CPU caches AOT objects keyed
    # on compiler pseudo-features (prefer-no-scatter/gather) that the host
    # probe never reports, so every cached load logs a spurious
    # machine-feature-mismatch error. CPU runs (tests) compile fast anyway;
    # set UPSNET_COMPILE_CACHE=<dir> to force caching there too.
    explicit = os.environ.get("UPSNET_COMPILE_CACHE")
    if not explicit and os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        return
    import jax

    cache_dir = path or explicit or os.path.expanduser("~/.cache/upsnet_xla")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax without these flags: run uncached
