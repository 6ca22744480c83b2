"""Runtime-capability probes.

Some PJRT runtimes (e.g. tunneled TPU backends) do not implement host
send/recv callbacks, which the in-jit iteration telemetry
(jax.debug.print, solve.py) and host callbacks (api.Solver.callbacks)
require. Probe once and cache."""

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def host_callbacks_supported() -> bool:
    """True iff the default backend can run jax.debug.callback inside jit
    (probed with a tiny program; result cached per process)."""
    try:

        def f(x):
            jax.debug.callback(lambda v: None, x)
            return x + 1

        jax.block_until_ready(jax.jit(f)(jnp.zeros(())))
        return True
    except Exception:
        return False
