"""Stateless-stage execution: task maps with a per-worker-process cached
instance.

The audio/image per-row stages are callable CLASSES whose ``__init__``
stores thresholds/config — no model state.  Running them as fixed actor
pools pays pool startup on every query and caps parallelism at the pool
floor; Ray's pool autoscaler ramps too slowly to help a seconds-long
stage (measured, q_speaker_turns at 32 cpus / 5000 clips: actor pool
(8,16) 6.4 s vs task map 2.2-3.9 s — the task path reuses WARM worker
processes and schedules into every free cpu).  This is the
``_perplexity_fused`` precedent (stages/perplexity_stage.py, measured 2×
end-to-end on the flagship) generalized: the instance is constructed once
per WORKER PROCESS keyed by (class, ctor args), giving actor-pool
amortization without the pool boundary.

``stateless_map`` routes an explicit TUPLE ``concurrency`` to a real
actor pool (callers that need one — e.g. a future stage whose cfg.extra
names a large model file — opt in by passing bounds); any int request
takes the task path, where the scheduler's own backpressure replaces the
cap.  At 10^12-clip scale both paths amortize setup identically (workers
persist for the job); the task path additionally survives worker loss
without actor-restart bookkeeping.
"""

from __future__ import annotations

import hashlib

from ray import cloudpickle

_CACHE: dict = {}
_CACHE_MAX = 64  # bounded: one instance per live stage shape, FIFO-evicted


def _cached_call(cls, ctor_args, ctor_kwargs, key, batch):
    inst = _CACHE.get(key)
    if inst is None:
        if len(_CACHE) >= _CACHE_MAX:
            # bound worker RSS on long multi-stage jobs (e.g. one augment
            # stage per epoch salt): evict the oldest instance — the
            # actor-pool path freed instances at pool teardown, this is
            # the task-path equivalent (round-5 review finding)
            _CACHE.pop(next(iter(_CACHE)))
        inst = _CACHE[key] = cls(*ctor_args, **ctor_kwargs)
    return inst(batch)


def process_cached(cls, ctor_args: tuple, ctor_kwargs: dict | None = None):
    """A picklable per-batch callable that constructs
    ``cls(*ctor_args, **ctor_kwargs)`` once per worker process and reuses
    it for every batch that process handles.  The cache key pickles the
    CLASS itself, not just its name: a module-level class keys by
    reference (module+qualname), while a closure-defined class shipped by
    value keys by its code — two same-named local classes with different
    bodies never share an instance (round-5 review finding)."""
    import functools

    ctor_kwargs = ctor_kwargs or {}
    key = hashlib.md5(
        cloudpickle.dumps((cls, ctor_args, sorted(ctor_kwargs.items())))
    ).hexdigest()
    return functools.partial(_cached_call, cls, ctor_args, ctor_kwargs, key)


def stateless_map(ds, cls, ctor_args: tuple = (), *, batch_size,
                  concurrency=None, ctor_kwargs: dict | None = None):
    """map_batches for a stateless callable class: task map with a
    process-cached instance by default; an explicit (lo, hi) tuple forces
    the actor-pool form."""
    if isinstance(concurrency, tuple):
        return ds.map_batches(
            cls,
            fn_constructor_args=ctor_args,
            fn_constructor_kwargs=ctor_kwargs,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )
    return ds.map_batches(
        process_cached(cls, ctor_args, ctor_kwargs),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
