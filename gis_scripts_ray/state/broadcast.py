"""Worker-process cache for broadcast objects used by fused task stages.

Task-based stages (the engine's default — no per-execution actor spawn,
operator fusion kept) receive broadcast state as a ``ray.put`` ObjectRef
and resolve it once per worker process through this cache. The cache is
BOUNDED (small LRU): refs are fresh per pipeline construction, so an
unbounded dict would grow forever in long-lived workers (one keep-id
array / weight matrix / remap table per call — the round-2 review's leak
finding).
"""

from __future__ import annotations

from collections import OrderedDict

_CACHE: OrderedDict = OrderedDict()
_MAX_ENTRIES = 8


def worker_broadcast(ref):
    """Resolve a broadcast ObjectRef, cached per worker process (LRU)."""
    import ray

    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    obj = _CACHE.get(key)
    if obj is None:
        obj = ray.get(ref)
        _CACHE[key] = obj
        while len(_CACHE) > _MAX_ENTRIES:
            _CACHE.popitem(last=False)
    else:
        _CACHE.move_to_end(key)
    return obj
