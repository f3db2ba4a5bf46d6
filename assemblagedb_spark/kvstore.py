"""MVCC key-value core: the engine's transactional substrate.

Semantics mirror the reference's ``assemblage_kv`` crate (NOT its storage
format — no log-structured bytes here): slots as namespaces, append-only
versions, tombstones, snapshot isolation, optimistic serializable commits,
monotonic timestamps, and ``merge()`` compaction.

  - versions per (slot, key), never overwritten    kv lib.rs:956-976
  - snapshot sees versions with ts <= snapshot     kv lib.rs:280-284,585-591
  - get vs get_unremoved ("trash read")            kv lib.rs:337-363
  - optimistic conflict detection on the read-set  kv lib.rs:298-315,531-545
  - merge() keeps latest version per key           kv lib.rs:233-277
  - monotonic commit timestamps                    kv timestamp.rs:36-38

The store is driver-side (the reference is a single-writer OLTP core; a
distributed log would be Delta-style table commits). Every slot can be
exported as a Spark DataFrame / parquet for the analytical operators, which
is the engine's actual scale path: OLTP edits land here, analytics run on
the exported columnar tables.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Iterator


@dataclass(frozen=True)
class Version:
    ts: int
    is_committed: bool
    is_removed: bool
    value: Any = None


class TransactionConflict(Exception):
    """A key read in this snapshot was overwritten by a later commit."""


class KvStore:
    """Append-only multi-slot versioned store with snapshot transactions."""

    def __init__(self) -> None:
        # (slot, key) -> list[Version] in commit order
        self._data: dict[tuple[int, str], list[Version]] = {}
        self._last_ts = 0

    # -- timestamps (kv timestamp.rs:36-38) --------------------------------
    def _next_ts(self) -> int:
        now = int(time.time() * 1000)
        self._last_ts = max(self._last_ts + 1, now)
        return self._last_ts

    def last_updated(self) -> int | None:
        return self._last_ts or None

    # -- snapshots ----------------------------------------------------------
    def current(self) -> "Snapshot":
        return Snapshot(self, self._last_ts)

    def transaction(self) -> "Snapshot":
        return self.current()

    # -- compaction (kv lib.rs:233-277) ------------------------------------
    def merge(self) -> None:
        compacted: dict[tuple[int, str], list[Version]] = {}
        for k, versions in self._data.items():
            last = versions[-1]
            if not last.is_removed:
                compacted[k] = [last]
        self._data = compacted

    # -- spark / parquet export --------------------------------------------
    def slot_rows(self, slot: int) -> Iterator[tuple[str, int, bool, Any]]:
        """(key, ts, is_removed, value) for every version in a slot."""
        for (s, key), versions in self._data.items():
            if s == slot:
                for v in versions:
                    yield key, v.ts, v.is_removed, v.value

    def save(self, path: str) -> None:
        rows = [
            {"slot": s, "key": k, "ts": v.ts, "is_removed": v.is_removed, "value": v.value}
            for (s, k), versions in self._data.items()
            for v in versions
        ]
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump({"last_ts": self._last_ts, "rows": rows}, f)

    @classmethod
    def load(cls, path: str) -> "KvStore":
        store = cls()
        with open(path) as f:
            payload = json.load(f)
        store._last_ts = payload["last_ts"]
        for r in payload["rows"]:
            store._data.setdefault((r["slot"], r["key"]), []).append(
                Version(r["ts"], True, r["is_removed"], r["value"])
            )
        for versions in store._data.values():
            versions.sort(key=lambda v: v.ts)
        return store


@dataclass
class Snapshot:
    """A transaction: snapshot reads + buffered writes + optimistic commit."""

    store: KvStore
    snapshot_ts: int
    _writes: dict[tuple[int, str], tuple[Any, bool]] = field(default_factory=dict)
    _read_set: set[tuple[int, str]] = field(default_factory=set)
    _aborted: bool = field(default=False)

    # -- reads --------------------------------------------------------------
    def _visible(self, slot: int, key: str) -> list[Version]:
        versions = self.store._data.get((slot, key), [])
        return [v for v in versions if v.ts <= self.snapshot_ts]

    def get(self, slot: int, key: str) -> Any | None:
        """Latest non-removed value (kv lib.rs:337-344). A buffered write in
        this txn wins (last write per key, kv lib.rs:467-474)."""
        if (slot, key) in self._writes:
            value, removed = self._writes[(slot, key)]
            return None if removed else value
        self._read_set.add((slot, key))
        vis = self._visible(slot, key)
        if not vis or vis[-1].is_removed:
            return None
        return vis[-1].value

    def get_unremoved(self, slot: int, key: str) -> Any | None:
        """Latest version ignoring the tombstone — "trash read"
        (kv lib.rs:355-363)."""
        if (slot, key) in self._writes:
            value, _removed = self._writes[(slot, key)]
            if value is not None:
                return value
        self._read_set.add((slot, key))
        for v in reversed(self._visible(slot, key)):
            if not v.is_removed:
                return v.value
        return None

    def get_version(self, slot: int, key: str, ts: int) -> Any | None:
        for v in self._visible(slot, key):
            if v.ts == ts:
                return v.value
        return None

    def versions(self, slot: int, key: str) -> list[Version]:
        """Full ordered version history (kv lib.rs:411-431)."""
        return list(self._visible(slot, key))

    def keys(self, slot: int) -> list[str]:
        """All live keys of a slot (kv lib.rs:449-465), including keys
        written in this transaction."""
        out = set()
        for (s, key) in self.store._data:
            if s == slot:
                vis = self._visible(s, key)
                if vis and not vis[-1].is_removed:
                    out.add(key)
        for (s, key), (_, removed) in self._writes.items():
            if s == slot:
                (out.discard if removed else out.add)(key)
        return sorted(out)

    # -- writes -------------------------------------------------------------
    def insert(self, slot: int, key: str, value: Any) -> None:
        self._writes[(slot, key)] = (value, False)

    def remove(self, slot: int, key: str) -> None:
        """Tombstone; the previous value stays readable via get_unremoved
        (kv lib.rs:494-512)."""
        self._writes[(slot, key)] = (None, True)

    def abort(self) -> None:
        self._writes.clear()
        self._aborted = True

    def commit(self) -> int | None:
        """Optimistic serializable commit (kv lib.rs:523-583): abort with
        TransactionConflict if any key in the read-set has a version newer
        than the snapshot; otherwise append all writes at one new ts."""
        if self._aborted:
            raise RuntimeError("transaction already aborted")
        if not self._writes:
            return None
        for slot, key in self._read_set:
            versions = self.store._data.get((slot, key), [])
            if versions and versions[-1].ts > self.snapshot_ts:
                raise TransactionConflict(f"conflict on slot={slot} key={key}")
        ts = self.store._next_ts()
        for (slot, key), (value, removed) in self._writes.items():
            self.store._data.setdefault((slot, key), []).append(
                Version(ts, True, removed, value)
            )
        self._writes.clear()
        return ts
