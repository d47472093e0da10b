"""Config layer: flag > env > file > default precedence, secret
channel, and CLI integration."""

import os

from howto_mongo_bulk_update_from_parquet_spark.config import EngineConfig, load_config


def _write_cfg(tmp_path, text):
    p = os.path.join(str(tmp_path), "config.yaml")
    with open(p, "w") as fh:
        fh.write(text)
    return p


def test_defaults_without_file_or_env():
    cfg = load_config(env={})
    assert cfg == EngineConfig()
    assert (cfg.database, cfg.collection, cfg.key) == ("db", "coll", "_id")


def test_file_overrides_default(tmp_path):
    p = _write_cfg(tmp_path, "database: sandbox\ncollection: bulk_update\n"
                             "logging:\n  level: DEBUG\n")   # nested ignored
    cfg = load_config(config_file=p, env={})
    assert cfg.database == "sandbox"
    assert cfg.collection == "bulk_update"
    assert cfg.key == "_id"                      # untouched default


def test_env_overrides_file(tmp_path):
    p = _write_cfg(tmp_path, "database: from_file\n")
    cfg = load_config(config_file=p,
                      env={"BULK_UPDATE_DATABASE": "from_env"})
    assert cfg.database == "from_env"


def test_flag_overrides_env_and_file(tmp_path):
    p = _write_cfg(tmp_path, "database: from_file\n")
    cfg = load_config(config_file=p,
                      env={"BULK_UPDATE_DATABASE": "from_env"},
                      database="from_flag")
    assert cfg.database == "from_flag"


def test_config_file_via_env_pointer(tmp_path):
    p = _write_cfg(tmp_path, "collection: pointed\n")
    cfg = load_config(env={"BULK_UPDATE_CONFIG": p})
    assert cfg.collection == "pointed"


def test_mongo_uri_secret_channel():
    # reference parity: MONGO_CONNECTION_STRING env var carries the URI
    cfg = load_config(env={"MONGO_CONNECTION_STRING": "mongodb://secret"})
    assert cfg.mongo_uri == "mongodb://secret"
    # explicit BULK_UPDATE_MONGO_URI is more specific and wins
    cfg = load_config(env={"MONGO_CONNECTION_STRING": "mongodb://secret",
                           "BULK_UPDATE_MONGO_URI": "mongodb://specific"})
    assert cfg.mongo_uri == "mongodb://specific"
    # a flag beats both
    cfg = load_config(env={"MONGO_CONNECTION_STRING": "mongodb://secret"},
                      mongo_uri="mongodb://flag")
    assert cfg.mongo_uri == "mongodb://flag"


def test_n_partitions_coerced_to_int(tmp_path):
    p = _write_cfg(tmp_path, "n_partitions: 16\n")
    cfg = load_config(config_file=p, env={})
    assert cfg.n_partitions == 16
    cfg = load_config(env={"BULK_UPDATE_N_PARTITIONS": "8"})
    assert cfg.n_partitions == 8


def test_cli_upsert_reads_config_file(spark, tmp_path, capsys, monkeypatch):
    from howto_mongo_bulk_update_from_parquet_spark.cli import main
    data = os.path.join(str(tmp_path), "data")
    table = os.path.join(str(tmp_path), "table")
    assert main(["generate", "--path", data, "--n-rows", "50",
                 "--n-files", "1"]) == 0
    cfgfile = _write_cfg(tmp_path, "key: _id\nn_partitions: 2\n")
    assert main(["upsert", "--path", data, "--table", table,
                 "--config", cfgfile]) == 0
    assert "50 rows" in capsys.readouterr().out


def test_cli_upsert_requires_some_sink(capsys):
    from howto_mongo_bulk_update_from_parquet_spark.cli import main
    assert main(["upsert", "--path", "/tmp/nope"]) == 2
    assert "requires --table or a Mongo URI" in capsys.readouterr().err
