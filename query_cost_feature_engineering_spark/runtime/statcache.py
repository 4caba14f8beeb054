"""Content-aware statistics-cache keys for driver-side plan statistics.

Several operators pay a small driver job to learn a corpus property
before planning the real query (as-of skew profiles, near-dup token
vocabularies, range-bucket cut points). Those statistics are pure
functions of (input data, parameters), so repeated invocations — bench
reps, resumed pipelines, a notebook cell re-run — should reuse them.

``DataFrame.semanticHash()`` alone is NOT a safe cache key: it hashes
the logical PLAN (i.e. the path), not the file contents, so rewriting
data at the same path in-process would silently return stale
statistics. ``plan_fingerprint`` combines the plan hash with a
fingerprint of the input file listing (path, size, mtime — the same
change-detector ``runtime/checkpoint.input_fingerprint`` uses for
resume), so a data rewrite misses the cache. With an Iceberg catalog
the listing would be replaced by the table's snapshot-id.
"""

from __future__ import annotations

import hashlib
import os
from urllib.parse import unquote, urlparse

_MISS = object()


def plan_fingerprint(df) -> tuple | None:
    """Best-effort cache key for a DataFrame's input: (semanticHash,
    sha256 of the sorted input-file listing with local size+mtime).
    Returns None when it cannot be computed — callers must then skip
    caching, never guess."""
    try:
        sh = df.semanticHash()
        files = sorted(df.inputFiles())
    except Exception:  # noqa: BLE001 — caching is best-effort only
        return None
    h = hashlib.sha256()
    for f in files:
        h.update(f.encode())
        p = unquote(urlparse(f).path) if f.startswith("file:") else f
        try:
            st = os.stat(p)
            h.update(f"{st.st_size},{st.st_mtime_ns}".encode())
        except OSError:
            # remote FS: the listing itself still detects add/remove/rename
            pass
    return (sh, h.hexdigest())


class StatsCache:
    """Tiny bounded-FIFO cache. Values may be None (a valid result), so
    misses are signalled by the module sentinel ``_MISS``."""

    def __init__(self, maxsize: int = 16):
        self._data: dict = {}
        self._max = maxsize

    def get(self, key):
        if key is None:
            return _MISS
        return self._data.get(key, _MISS)

    def put(self, key, value) -> None:
        if key is None:
            return
        if len(self._data) >= self._max:
            self._data.pop(next(iter(self._data)))
        self._data[key] = value

    def clear(self) -> None:
        self._data.clear()
