"""Task-based stages with per-worker-process memoized state.

Ray Data actor pools pay a fresh-process spawn + import per actor and
actor processes are not reused across pools — measured seconds of idle
pipeline per pool on this machine. For stages whose state is cheap to
build but worth amortizing (compiled regexes, permutation params, a
broadcast handle), the faster shape is a plain *task* function (runs in
Ray's prestarted warm workers) that lazily constructs the stage object
once per worker process and memoizes it in a module global.

Reserve true actor pools for genuinely heavy state: model weights,
browser/HTTP sessions, GPU contexts.
"""

from __future__ import annotations

import ray

_CACHE: dict = {}


def _key_part(v):
    if isinstance(v, ray.ObjectRef):
        return v.hex()
    if isinstance(v, dict):
        return tuple(sorted((k, _key_part(x)) for k, x in v.items()))
    if isinstance(v, (list, tuple)):
        return tuple(_key_part(x) for x in v)
    return v


def cached_stage(cls, **ctor_kwargs):
    """A map_batches-ready function that behaves like
    ``cls(**ctor_kwargs).__call__`` with one instance per worker
    process. Constructor kwargs may include ``ray.ObjectRef``s."""
    try:
        key = (cls.__module__, cls.__qualname__,
               tuple(sorted((k, _key_part(v)) for k, v in ctor_kwargs.items())))
    except TypeError:  # unhashable kwarg → no sharing, per-task instance
        key = None

    def stage_fn(batch):
        if key is None:
            return cls(**ctor_kwargs)(batch)
        inst = _CACHE.get(key)
        if inst is None:
            inst = cls(**ctor_kwargs)
            _CACHE[key] = inst
        return inst(batch)

    stage_fn.__name__ = f"cached_{cls.__name__}"
    return stage_fn


from contextlib import contextmanager


@contextmanager
def chain_execution():
    """Scoped: disable the streaming executor's per-operator resource
    reservation for a CHAIN-shaped pipeline, restoring the caller's
    setting on exit.

    The reservation (50% split across operators) exists to keep
    concurrent heavy operators from starving each other; in a linear
    chain with all-to-all barriers there is only ever one runnable
    heavy op, so the reservation just caps it at a fraction of the
    cluster — measured 18.0→16.3 s on the 8-CPU listing pipeline and
    10.8→8.7 s on the 32-CPU corpus-prep chain. Callers running
    genuinely concurrent pipelines should NOT wrap them in this."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    prev = ctx.op_resource_reservation_enabled
    ctx.op_resource_reservation_enabled = False
    try:
        yield
    finally:
        ctx.op_resource_reservation_enabled = prev
