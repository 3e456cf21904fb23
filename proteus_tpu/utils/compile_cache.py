"""Persistent XLA compilation cache (shared across CLI invocations).

First compilation of the fused chain / device warps costs tens of seconds
on a tunneled TPU; the persistent cache makes every later process reuse
them. Override the location with PROTEUS_TPU_COMPILE_CACHE; disable with
PROTEUS_TPU_COMPILE_CACHE=off.
"""

import os

_READY = False


def enable():
    global _READY
    if _READY:
        return
    _READY = True
    cache_dir = os.environ.get(
        'PROTEUS_TPU_COMPILE_CACHE',
        os.path.join(os.path.expanduser('~'), '.cache', 'proteus_tpu',
                     'xla'))
    if cache_dir.lower() == 'off':
        return
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          1.0)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass
