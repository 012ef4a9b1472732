"""Session-scoped memo caches for expensive query-builder artifacts
(persisted shingle tables, converged cluster labels, collected
codebooks).

One eviction policy, used by every cache (duplicating it drifted in
round 4 — r4 review finding): a key is ``(applicationId, group,
mtime)``; on lookup, entries from other (stopped) applications are
dropped, and same-group entries with a different mtime are dropped as
STALE (a fixture rewritten under the same path must never serve old
data).  EVERY evicted value gets ``unpersist(blocking=False)`` when it
supports it (no-op for ndarrays and checkpointed DataFrames) —
including other-app entries: with two concurrently live SparkSessions
in one process, dropping another app's entry without unpersisting
would leak its persisted blocks (r4 advisor finding).  unpersist on a
stopped context raises and is swallowed by the guard.
"""

from __future__ import annotations

import os


def source_mtime(path: str) -> float:
    try:
        return os.path.getmtime(path)
    except OSError:
        return -1.0


def memo_lookup(cache: dict, app: str, group, mtime: float):
    """(key, cached-or-None) after applying the eviction policy."""
    key = (app, group, mtime)
    for k in [k for k in cache if k[0] != app or (k[1] == group and k != key)]:
        try:
            cache[k].unpersist(blocking=False)
        except Exception:
            pass
        del cache[k]
    return key, cache.get(key)
