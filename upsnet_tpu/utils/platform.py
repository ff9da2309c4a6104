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
