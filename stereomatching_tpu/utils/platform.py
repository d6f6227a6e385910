"""Platform selection + compile-cache defaults.

Some environments pin the JAX platform via ``jax.config`` in a site
hook, which silently overrides the ``JAX_PLATFORMS`` environment
variable; and TPU backends reached through remote-compile tunnels take
minutes per fresh compile.  Entry points call ``ensure_platform()`` so
that (a) the env var behaves as documented and (b) repeated runs at the
same shapes reuse the persistent compilation cache.
"""

from __future__ import annotations

import os


def ensure_platform() -> None:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_stereo")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        jax.config.update("jax_platforms", want)
