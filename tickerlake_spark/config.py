"""Validated runtime settings (env-driven, bounds-checked).

Mirrors the reference's pydantic ``Settings`` surface (reference:
src/tickerlake/config.py:10-47) without the pydantic dependency: a frozen
dataclass constructed from environment variables, with the same computed
paths (``base_path`` / ``checkpoint_path``) and the same validation rules
(``bronze_parallel_requests >= 1``, ported test: reference
tests/test_config.py:8-26). The Spark-runtime knobs the engine already read
from the environment (``SPARK_GRAFT_CPUS`` etc., session.py) are folded in
so there is exactly one place configuration enters the system.

Secrets are wrapped in :class:`Secret` so ``repr(settings)`` / logs never
leak the API key (reference uses pydantic ``SecretStr`` for the same
reason, src/tickerlake/config.py:14).
"""

from __future__ import annotations

import datetime as dt
import os
from dataclasses import dataclass, field
from pathlib import Path

__all__ = ["Secret", "Settings", "get_settings"]


class Secret:
    """A string whose repr/str never shows the value (SecretStr analog)."""

    def __init__(self, value: str) -> None:
        self._value = value

    def get_secret_value(self) -> str:
        return self._value

    def __repr__(self) -> str:  # pragma: no cover - trivial
        return "Secret('**********')" if self._value else "Secret('')"

    __str__ = __repr__

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Secret) and other._value == self._value

    def __hash__(self) -> int:
        return hash(self._value)


def _env_int(name: str, default: int) -> int:
    raw = os.environ.get(name)
    if raw is None or raw == "":
        return default
    try:
        return int(raw)
    except ValueError as e:
        raise ValueError(f"{name} must be an integer, got {raw!r}") from e


@dataclass(frozen=True)
class Settings:
    """Engine configuration. Construct directly in tests; use
    :func:`get_settings` for the env-driven singleton.

    Reference parity (src/tickerlake/config.py):
    - polygon_api_key / data_start_year / data_dir / checkpoint_file /
      bronze_parallel_requests with the >= 1 bound.
    Spark-runtime additions:
    - cpus / shuffle_partitions / driver_memory (session.py reads these).
    """

    # API access (reference: config.py:14-15)
    polygon_api_key: Secret = field(default_factory=lambda: Secret(""))
    data_start_year: int = dt.date.today().year - 5

    # Storage (reference: config.py:18-22)
    data_dir: str = "data"
    checkpoint_file: str = "checkpoints.json"

    # Ingestion (reference: config.py:22, bound at config.py:39-46)
    bronze_parallel_requests: int = 4

    # Spark runtime (this engine's additions; session.py)
    cpus: int = 32
    shuffle_partitions: int | None = None
    # local[N] puts driver AND all executor threads in ONE JVM: this is the
    # whole cluster's memory, not a driver heap. 8g starved 32 concurrent
    # partitioned-write tasks at the 125M-row scale (execution pool
    # exhausted under the per-task dynamic-partition sort); the harness box
    # has 128 GiB — size for it. Override with SPARK_GRAFT_DRIVER_MEM.
    driver_memory: str = "32g"

    def __post_init__(self) -> None:
        if isinstance(self.polygon_api_key, str):  # convenience coercion
            object.__setattr__(self, "polygon_api_key", Secret(self.polygon_api_key))
        if self.bronze_parallel_requests < 1:
            raise ValueError("bronze_parallel_requests must be at least 1")
        if self.cpus < 1:
            raise ValueError("cpus must be at least 1")
        if self.shuffle_partitions is not None and self.shuffle_partitions < 1:
            raise ValueError("shuffle_partitions must be at least 1")
        if self.data_start_year < 1970:
            raise ValueError("data_start_year must be >= 1970")

    # Computed paths (reference: config.py:24-37). Unlike the reference we
    # do NOT mkdir in the getter — path computation must be side-effect-free
    # on a driver that may only have write access at job submit time; the
    # writer creates directories.
    @property
    def base_path(self) -> str:
        return str(Path(self.data_dir).resolve())

    @property
    def checkpoint_path(self) -> str:
        return str(Path(self.base_path) / self.checkpoint_file)

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "Settings":
        """Build Settings from environment variables.

        ``TICKERLAKE_*`` for data-plane settings, ``SPARK_GRAFT_*`` for the
        Spark runtime knobs the harness already uses.
        """
        e = os.environ if env is None else env

        def get(name: str, default: str) -> str:
            return e.get(name, default) or default

        def get_int(name: str, default: int) -> int:
            raw = e.get(name)
            if raw in (None, ""):
                return default
            try:
                return int(raw)
            except ValueError as exc:
                raise ValueError(f"{name} must be an integer, got {raw!r}") from exc

        shuffle_raw = e.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        return cls(
            polygon_api_key=Secret(e.get("POLYGON_API_KEY", "")),
            data_start_year=get_int(
                "TICKERLAKE_DATA_START_YEAR", dt.date.today().year - 5
            ),
            data_dir=get("TICKERLAKE_DATA", "data"),
            checkpoint_file=get("TICKERLAKE_CHECKPOINT_FILE", "checkpoints.json"),
            bronze_parallel_requests=get_int("TICKERLAKE_BRONZE_PARALLEL_REQUESTS", 4),
            cpus=get_int("SPARK_GRAFT_CPUS", 32),
            shuffle_partitions=int(shuffle_raw) if shuffle_raw else None,
            driver_memory=get("SPARK_GRAFT_DRIVER_MEM", "32g"),
        )


_settings: Settings | None = None


def get_settings(refresh: bool = False) -> Settings:
    """Process-wide Settings singleton (reference: config.py:50 module-level
    ``settings``). ``refresh=True`` re-reads the environment (tests)."""
    global _settings
    if _settings is None or refresh:
        _settings = Settings.from_env()
    return _settings
