"""Size-safe norms (empty vectors have norm 0; shapes are static so the
guards resolve at trace time)."""

import math

import jax.numpy as jnp


def inf_norm(v):
    if v.size == 0:
        return jnp.zeros((), v.dtype)
    return jnp.max(jnp.abs(v))


def one_norm(v):
    if v.size == 0:
        return jnp.zeros((), v.dtype)
    return jnp.sum(jnp.abs(v))


def norm_p(v, p):
    """||v||_p for static p in {1, 2, inf} (reference uses julia norm(x, p)
    with p a solver option, options.jl:7-8)."""
    if v.size == 0:
        return jnp.zeros((), v.dtype)
    if p == 1.0 or p == 1:
        return one_norm(v)
    if p == 2.0 or p == 2:
        return jnp.sqrt(jnp.sum(v * v))
    if math.isinf(p):
        return inf_norm(v)
    return jnp.sum(jnp.abs(v) ** p) ** (1.0 / p)
