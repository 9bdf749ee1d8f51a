"""Worker-process cache for broadcast objects used by fused task stages.

Task-based stages (the engine's default — no per-execution actor spawn,
operator fusion kept) receive broadcast state as a ``ray.put`` ObjectRef
and resolve it once per worker process through this cache. The cache is
BOUNDED (small LRU): refs are fresh per pipeline construction, so an
unbounded dict would grow forever in long-lived workers (one keep-id
array / weight matrix / remap table per call — the round-2 review's leak
finding).

Thrash visibility (ADVICE r2): a fused pipeline holding more live refs
per worker than the capacity would silently re-``ray.get`` every batch.
The capacity is configurable (``GRAFT_BROADCAST_CACHE`` env var, read at
worker import, or :func:`set_capacity`), evictions are counted, and the
first eviction of a *recently used* key — the thrash signature, as
opposed to benign retirement of a previous pipeline's refs — logs one
warning per worker process.
"""

from __future__ import annotations

import logging
import os
from collections import OrderedDict

_CACHE: OrderedDict = OrderedDict()
_MAX_ENTRIES = int(os.environ.get("GRAFT_BROADCAST_CACHE", "8"))
_EVICTIONS = 0
_THRASH_WARNED = False
# keys resolved within the last _MAX_ENTRIES lookups count as "recent":
# evicting one means the working set exceeds capacity (thrash), while
# evicting a stale key is normal retirement
_LOOKUP_CLOCK = 0
_LAST_USED: dict = {}

_log = logging.getLogger(__name__)


def set_capacity(n: int) -> None:
    """Override the per-worker cache capacity (e.g. before a pipeline whose
    stages hold many live broadcast refs)."""
    global _MAX_ENTRIES
    _MAX_ENTRIES = max(1, int(n))


def eviction_count() -> int:
    """Evictions in THIS worker process (debug/telemetry)."""
    return _EVICTIONS


def worker_broadcast(ref):
    """Resolve a broadcast ObjectRef, cached per worker process (LRU)."""
    import ray

    global _EVICTIONS, _THRASH_WARNED, _LOOKUP_CLOCK

    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    _LOOKUP_CLOCK += 1
    obj = _CACHE.get(key)
    if obj is None:
        obj = ray.get(ref)
        _CACHE[key] = obj
        while len(_CACHE) > _MAX_ENTRIES:
            old_key, _ = _CACHE.popitem(last=False)
            _EVICTIONS += 1
            recent = _LOOKUP_CLOCK - _LAST_USED.pop(old_key, -(10**9))
            if recent <= _MAX_ENTRIES and not _THRASH_WARNED:
                _THRASH_WARNED = True
                _log.warning(
                    "broadcast cache thrashing: evicted a key used %d lookups "
                    "ago (capacity %d; raise GRAFT_BROADCAST_CACHE or call "
                    "set_capacity)", recent, _MAX_ENTRIES,
                )
    else:
        _CACHE.move_to_end(key)
    _LAST_USED[key] = _LOOKUP_CLOCK
    if len(_LAST_USED) > 4 * _MAX_ENTRIES:
        # bound the bookkeeping map itself
        cutoff = _LOOKUP_CLOCK - 2 * _MAX_ENTRIES
        for k in [k for k, v in _LAST_USED.items() if v < cutoff]:
            del _LAST_USED[k]
    return obj
