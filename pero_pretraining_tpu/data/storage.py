"""Key-value storage for line images and line records.

The reference reads JPEG crops from LMDB (reference: common/dataset.py:28,
:146-151). lmdb may not be installed in every environment, so storage is an
interface with two backends:

- `LmdbStore` — the reference's format, used when the `lmdb` package is
  available (read txn opened once, read-only, lock-free — same settings as
  common/dataset.py:28).
- `SqliteStore` — stdlib fallback with identical semantics (one file, one
  `kv(key BLOB PRIMARY KEY, value BLOB)` table, safe concurrent readers).

`open_store` sniffs the format; conversion tools (scripts/convert_gt_to_lmdb)
write whichever backend is available.
"""

from __future__ import annotations

import os
import sqlite3
import threading
from typing import Iterator, Optional

try:
    import lmdb  # type: ignore

    HAS_LMDB = True
except ImportError:  # pragma: no cover - environment dependent
    lmdb = None
    HAS_LMDB = False


class KVStore:
    def get(self, key: str) -> Optional[bytes]:
        raise NotImplementedError

    def put(self, key: str, value: bytes) -> None:
        raise NotImplementedError

    def keys(self) -> Iterator[str]:
        raise NotImplementedError

    def __len__(self) -> int:
        raise NotImplementedError

    def close(self) -> None:
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class LmdbStore(KVStore):
    def __init__(self, path: str, readonly: bool = True, map_size: int = 1_000_000_000_000):
        if not HAS_LMDB:
            raise RuntimeError("lmdb package is not available")
        self.env = lmdb.open(path, readonly=readonly, lock=False, map_size=map_size, subdir=True, create=not readonly)
        self._readonly = readonly

    def get(self, key: str) -> Optional[bytes]:
        with self.env.begin() as txn:
            return txn.get(key.encode())

    def put(self, key: str, value: bytes) -> None:
        with self.env.begin(write=True) as txn:
            txn.put(key.encode(), value)

    def keys(self) -> Iterator[str]:
        with self.env.begin() as txn:
            with txn.cursor() as cur:
                for k in cur.iternext(keys=True, values=False):
                    yield k.decode()

    def __len__(self) -> int:
        with self.env.begin() as txn:
            return txn.stat()["entries"]

    def close(self) -> None:
        self.env.close()


class SqliteStore(KVStore):
    """Thread-safe sqlite KV store (per-thread connections)."""

    def __init__(self, path: str, readonly: bool = True):
        self.path = path
        self._readonly = readonly
        self._local = threading.local()
        if not readonly:
            conn = self._conn()
            conn.execute("CREATE TABLE IF NOT EXISTS kv (key BLOB PRIMARY KEY, value BLOB)")
            conn.commit()
        else:
            self._conn()  # fail fast if missing

    def _conn(self) -> sqlite3.Connection:
        conn = getattr(self._local, "conn", None)
        if conn is None:
            if self._readonly:
                uri = f"file:{self.path}?mode=ro"
                conn = sqlite3.connect(uri, uri=True, check_same_thread=False)
            else:
                conn = sqlite3.connect(self.path, check_same_thread=False)
            self._local.conn = conn
        return conn

    def get(self, key: str) -> Optional[bytes]:
        row = self._conn().execute("SELECT value FROM kv WHERE key = ?", (key.encode(),)).fetchone()
        return bytes(row[0]) if row is not None else None

    def put(self, key: str, value: bytes) -> None:
        self._conn().execute("INSERT OR REPLACE INTO kv (key, value) VALUES (?, ?)", (key.encode(), value))

    def commit(self) -> None:
        self._conn().commit()

    def keys(self) -> Iterator[str]:
        for (k,) in self._conn().execute("SELECT key FROM kv ORDER BY key"):
            yield bytes(k).decode()

    def __len__(self) -> int:
        (n,) = self._conn().execute("SELECT COUNT(*) FROM kv").fetchone()
        return n

    def close(self) -> None:
        conn = getattr(self._local, "conn", None)
        if conn is not None:
            if not self._readonly:
                conn.commit()
            conn.close()
            self._local.conn = None


def open_store(path: str, readonly: bool = True) -> KVStore:
    """Sniff the on-disk format: an LMDB directory (data.mdb inside) or a
    sqlite file."""
    if os.path.isdir(path) and os.path.exists(os.path.join(path, "data.mdb")):
        return LmdbStore(path, readonly=readonly)
    if os.path.isfile(path):
        with open(path, "rb") as f:
            magic = f.read(16)
        if magic.startswith(b"SQLite format 3"):
            return SqliteStore(path, readonly=readonly)
    if not readonly:
        # create: prefer lmdb when present (reference-compatible), else sqlite
        if HAS_LMDB:
            os.makedirs(path, exist_ok=True)
            return LmdbStore(path, readonly=False)
        return SqliteStore(path, readonly=False)
    raise FileNotFoundError(f"No KV store found at {path}")
