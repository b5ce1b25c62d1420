"""S4 config-load parity tests (reference: config.py:9-40 — strict
TOML → validated models; unknown keys rejected; flags default False)."""

from __future__ import annotations

import pytest

from logsdb_spark.config import Config, ConfigError

GOOD = """
[storage]
tables_dir = "/data/tables"
checkpoint_dir = "/data/ckpt"

[features]
authfail = true

[dailyreport]
recipient = "ops@example.com"
mailbox = "/var/mail/root"
logs_dir = "/var/log/errors"
"""


def test_roundtrip(tmp_path):
    f = tmp_path / "cfg.toml"
    f.write_text(GOOD)
    cfg = Config.from_toml_file(f)
    assert cfg.storage.tables_dir == "/data/tables"
    # flags default False, explicitly-set flag sticks (config.py:19-22)
    assert cfg.features.authfail is True
    assert cfg.features.apache_access is False
    assert cfg.features.maillog is False
    assert cfg.dailyreport.recipient == "ops@example.com"


def test_unknown_key_rejected(tmp_path):
    f = tmp_path / "cfg.toml"
    f.write_text(GOOD + '\n[storage2]\nx = "y"\n')
    with pytest.raises(ConfigError, match="unknown sections"):
        Config.from_toml_file(f)


def test_unknown_field_rejected():
    data = {
        "storage": {"tables_dir": "a", "checkpoint_dir": "b", "extra": 1},
        "dailyreport": {"recipient": "r", "mailbox": "m", "logs_dir": "l"},
    }
    with pytest.raises(ConfigError, match=r"\[storage\] unknown keys"):
        Config.from_dict(data)


def test_missing_required_rejected():
    with pytest.raises(ConfigError, match=r"missing section \[dailyreport\]"):
        Config.from_dict({"storage": {"tables_dir": "a", "checkpoint_dir": "b"}})
    with pytest.raises(ConfigError, match=r"\[dailyreport\]"):
        Config.from_dict(
            {
                "storage": {"tables_dir": "a", "checkpoint_dir": "b"},
                "dailyreport": {"recipient": "r"},
            }
        )


def test_connect_registers_catalog(spark):
    cfg = Config.from_dict(
        {
            "storage": {
                "tables_dir": "/root/testdata/sf0.001",
                "checkpoint_dir": "/tmp/ckpt",
            },
            "dailyreport": {"recipient": "r", "mailbox": "m", "logs_dir": "l"},
        }
    )
    s = cfg.connect()
    assert s.sql("SELECT COUNT(*) AS n FROM nation").collect()[0].n == 25
