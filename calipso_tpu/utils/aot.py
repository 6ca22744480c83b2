"""Ahead-of-time program cache for batched solves (round-5 "compile
wall" work).

The d=54 contact program's cold start is dominated by Python TRACING,
not XLA compilation (measured on a v5e driver shape: ~117 s trace vs
~24 s cache-hit compile; docs/performance.md "Cold-start anatomy") --
and JAX's persistent compilation cache only covers the XLA part.  This
module serializes the traced program itself with `jax.export`
(StableHLO), so a later process skips tracing entirely: it deserializes
the module (sub-second), compiles (absorbed by the persistent XLA
cache), and runs.

The public entry points are BatchedTrajOptSolver.aot_save/aot_load
(parallel/batch.py).  `cached_batched` is the keyed variant bench.py
uses: the key hashes the package sources plus the problem fingerprint,
so a code or shape change retraces instead of serving a stale program.

The reference has no analogue (Julia caches native code per session);
the role matches its precompilation story (SURVEY.md section 6).
"""

from __future__ import annotations

import hashlib
import os

import jax


_REGISTERED = False


def register_serialization():
    """Register the solver's NamedTuple pytrees for jax.export
    serialization (idempotent)."""
    global _REGISTERED
    if _REGISTERED:
        return
    from calipso_tpu.solver.api import SolveResult
    from calipso_tpu.solver.kkt import Blocks
    from calipso_tpu.solver.solve import State

    for ty in (SolveResult, State, Blocks):
        try:
            jax.export.register_namedtuple_serialization(
                ty, serialized_name=f"calipso_tpu.{ty.__name__}"
            )
        except ValueError:
            pass  # already registered (idempotent across instances)
    _REGISTERED = True


def export_fn(fn, *example_args):
    """Trace + serialize a jitted function at the example arguments.
    Returns the serialized bytes."""
    register_serialization()
    return jax.export.export(fn)(*example_args).serialize()


def load_fn(blob):
    """Deserialize a program saved by export_fn into a callable (jitted,
    so the XLA compile goes through the persistent compilation cache)."""
    register_serialization()
    exp = jax.export.deserialize(blob)
    return jax.jit(exp.call)


def _package_hash():
    """Hash of every calipso_tpu source file: any code change changes the
    cache key, so a stale traced program is never served."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha1()
    for dirpath, _dirnames, filenames in sorted(os.walk(root)):
        for f in sorted(filenames):
            if f.endswith(".py"):
                p = os.path.join(dirpath, f)
                h.update(p.encode())
                with open(p, "rb") as fh:
                    h.update(fh.read())
    return h.hexdigest()[:12]


def cache_path(tag: str, fingerprint: str) -> str:
    base = os.path.join(
        os.path.expanduser(os.environ.get("XDG_CACHE_HOME", "~/.cache")),
        "calipso_tpu",
        "aot",
    )
    os.makedirs(base, exist_ok=True)
    key = hashlib.sha1(
        (fingerprint + "|" + _package_hash()).encode()
    ).hexdigest()[:16]
    return os.path.join(base, f"{tag}-{key}.jaxexport")


def cached_batched(fn, tag: str, fingerprint: str, *example_args):
    """Return a callable equivalent to jit(fn) at the example shapes,
    loading the traced program from the keyed cache when present and
    tracing + saving it otherwise. Returns (callable, was_cached)."""
    if os.environ.get("CALIPSO_AOT_CACHE", "1") != "1":
        return fn, False
    path = cache_path(tag, fingerprint)
    if os.path.exists(path):
        with open(path, "rb") as f:
            return load_fn(f.read()), True
    blob = export_fn(fn, *example_args)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return load_fn(blob), False
