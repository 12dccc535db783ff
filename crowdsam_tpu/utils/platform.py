"""Platform selection helper.

The axon environment pins `jax_platforms` to "axon,cpu" via sitecustomize,
which silently overrides the documented JAX_PLATFORMS env var.  Tools call
this first so user intent (JAX_PLATFORMS=cpu for local runs) is honored.
"""

import os


def respect_jax_platforms_env() -> None:
    val = os.environ.get("JAX_PLATFORMS")
    if not val:
        return
    import jax

    try:
        if jax.config.jax_platforms != val:
            jax.config.update("jax_platforms", val)
    except Exception:
        pass
