"""Pipeline checkpoint state (driver-side JSON).

Same design as the reference (reference: storage/checkpoints.py:13-70): a tiny
JSON document with watermark keys (``bronze_stocks_last_date``,
``silver_last_full_rewrite``, ``last_run_timestamp``). State this small does
not belong in the cluster; a driver-side file (or object-store key) is the
right scale. Writes go through the storage FS protocol's
``write_file_atomic`` — tmp + fsync + atomic rename on POSIX, a single
atomic whole-object PUT on rename-less stores — so a crashed run never
leaves a torn checkpoint on either.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from tickerlake_spark.storage.fs import FS, LOCAL_FS

__all__ = ["Checkpoints"]

KNOWN_KEYS = (
    "bronze_stocks_last_date",
    "silver_last_full_rewrite",
    "last_run_timestamp",
)


@dataclass
class Checkpoints:
    path: str
    fs: FS = field(default=LOCAL_FS)

    def load(self) -> dict:
        if not self.fs.isfile(self.path):
            return {}
        return json.loads(self.fs.read_bytes(self.path).decode())

    def save(self, state: dict) -> None:
        # write_file_atomic fsyncs BEFORE its rename on POSIX: without
        # that a power loss can persist the rename while the data pages
        # are still unflushed — an empty/torn checkpoint that reads as
        # "no watermark" and silently re-ingests history (same ordering
        # rule as the swap journal's marker writes). On object stores the
        # write is one atomic PUT.
        data = json.dumps(state, indent=2, sort_keys=True).encode()
        self.fs.write_file_atomic(self.path, data)

    def get(self, key: str, default=None):
        return self.load().get(key, default)

    def set(self, key: str, value) -> None:
        state = self.load()
        state[key] = value
        self.save(state)
