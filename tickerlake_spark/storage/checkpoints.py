"""Pipeline checkpoint state (driver-side JSON).

Same design as the reference (reference: storage/checkpoints.py:13-70): a tiny
JSON document with watermark keys (``bronze_stocks_last_date``,
``silver_last_full_rewrite``, ``last_run_timestamp``). State this small does
not belong in the cluster; a driver-side file (or object-store key) is the
right scale. Writes are atomic (tmp + rename) so a crashed run never leaves a
torn checkpoint.
"""

from __future__ import annotations

import json
import os
import tempfile
from dataclasses import dataclass

__all__ = ["Checkpoints"]

KNOWN_KEYS = (
    "bronze_stocks_last_date",
    "silver_last_full_rewrite",
    "last_run_timestamp",
)


@dataclass
class Checkpoints:
    path: str

    def load(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def save(self, state: dict) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(self.path) or ".", suffix=".tmp"
        )
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(state, f, indent=2, sort_keys=True)
                # fsync BEFORE the rename: without it a power loss can
                # persist the rename while the data pages are still
                # unflushed — an empty/torn checkpoint that reads as
                # "no watermark" and silently re-ingests history (same
                # ordering rule as the swap journal's marker writes)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def get(self, key: str, default=None):
        return self.load().get(key, default)

    def set(self, key: str, value) -> None:
        state = self.load()
        state[key] = value
        self.save(state)
