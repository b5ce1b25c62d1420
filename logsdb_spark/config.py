"""Engine configuration — S4 parity (reference: config.py:9-50).

The reference loads a TOML file into strictly-validated models
(pydantic ``extra="forbid"``, config.py:9-10) with three sections:
database credentials, per-source feature flags (config.py:19-22), and
daily-report settings (config.py:25-28) — then turns the config into a
live connection whose side effect is schema creation
(``connect_to_database`` → ``Database.connect`` → ``create_all``,
config.py:42-50, core.py:26-28).

Spark-native analogue: the [database] section becomes [storage] (a
tables directory + streaming checkpoint root instead of Postgres
creds); ``connect()`` builds the SparkSession and registers the table
catalog — the same load-validate-connect-register lifecycle. Strictness
is preserved without pydantic: unknown keys anywhere raise, missing
required keys raise (plain dataclasses + tomllib; no new dependencies).
"""

from __future__ import annotations

import tomllib
from dataclasses import dataclass, fields
from pathlib import Path
from typing import Any


class ConfigError(ValueError):
    pass


def _strict(cls: type, data: dict[str, Any], section: str) -> Any:
    """dataclass(**data) with extra='forbid' semantics
    (reference config.py:9-10)."""
    allowed = {f.name for f in fields(cls)}
    unknown = set(data) - allowed
    if unknown:
        raise ConfigError(f"[{section}] unknown keys: {sorted(unknown)}")
    try:
        return cls(**data)
    except TypeError as e:  # missing required keys
        raise ConfigError(f"[{section}] {e}") from None


@dataclass(frozen=True)
class Storage:
    """Replaces DatabaseDetails (config.py:13-16): where tables live."""

    tables_dir: str
    checkpoint_dir: str


@dataclass(frozen=True)
class Features:
    """Per-source flags gating the report sections
    (config.py:19-22; used at dailyreport.py:125-130)."""

    apache_access: bool = False
    authfail: bool = False
    maillog: bool = False


@dataclass(frozen=True)
class DailyReportCfg:
    """Report settings (config.py:25-28)."""

    recipient: str
    mailbox: str
    logs_dir: str


@dataclass(frozen=True)
class Config:
    storage: Storage
    features: Features
    dailyreport: DailyReportCfg

    @classmethod
    def from_toml_file(cls, fpath: Path | str) -> Config:
        with open(fpath, "rb") as fp:
            data = tomllib.load(fp)
        return cls.from_dict(data)

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> Config:
        unknown = set(data) - {"storage", "features", "dailyreport"}
        if unknown:
            raise ConfigError(f"unknown sections: {sorted(unknown)}")
        for required in ("storage", "dailyreport"):
            if required not in data:
                raise ConfigError(f"missing section [{required}]")
        return cls(
            storage=_strict(Storage, data["storage"], "storage"),
            features=_strict(Features, data.get("features", {}), "features"),
            dailyreport=_strict(DailyReportCfg, data["dailyreport"], "dailyreport"),
        )

    def connect(self, app_name: str = "logsdb_spark"):
        """Session + catalog registration — the analogue of
        connect_to_database()'s connect-then-create_all side effect
        (config.py:42-50, core.py:26-28). Idempotent like create_all."""
        from .catalog import register_views
        from .session import get_spark

        spark = get_spark(app_name)
        register_views(spark, self.storage.tables_dir)
        return spark
