"""File + env + flag configuration — reference X2 parity
(/root/reference/src/config.py:8-14 loads config.yaml with
BULK_UPDATE_* env overrides and the Mongo URI from the environment;
/root/reference/config.yaml:2-3 carries database/collection).

Precedence, highest first: CLI flag > environment variable
(`BULK_UPDATE_<FIELD>`; `MONGO_CONNECTION_STRING` for the URI secret,
matching the reference) > config file > dataclass default. Secrets
never belong in the file — only the env carries the URI.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, fields

ENV_PREFIX = "BULK_UPDATE_"
DEFAULT_CONFIG_FILE = "config.yaml"


@dataclass
class EngineConfig:
    mongo_uri: str | None = None
    database: str = "db"
    collection: str = "coll"
    key: str = "_id"
    n_partitions: int | None = None
    # streaming state width (one state store per shuffle partition);
    # sizing rule in streaming/jobs.py::resolve_state_partitions. The
    # env channel BULK_UPDATE_STREAM_STATE_PARTITIONS is also read
    # directly by resolve_state_partitions for conf-less callers.
    stream_state_partitions: int | None = None

    @classmethod
    def field_names(cls) -> list[str]:
        return [f.name for f in fields(cls)]


def _read_config_file(path: str) -> dict[str, object]:
    """Flat key: value map from a YAML file (nested sections beyond the
    known fields are ignored — e.g. the reference's logging block)."""
    try:
        import yaml
    except ImportError:
        # minimal flat `key: value` parser so the layer still works
        # without PyYAML
        out: dict[str, object] = {}
        with open(path) as fh:
            for line in fh:
                line = line.split("#", 1)[0].strip()
                if ":" in line and not line.startswith("-"):
                    k, v = line.split(":", 1)
                    if v.strip():
                        out[k.strip()] = v.strip()
        return out
    with open(path) as fh:
        data = yaml.safe_load(fh) or {}
    return data if isinstance(data, dict) else {}


def load_config(config_file: str | None = None,
                env: dict[str, str] | None = None,
                **flag_overrides: object) -> EngineConfig:
    """Resolve the engine config with flag > env > file > default.

    `config_file`: explicit path, else `$BULK_UPDATE_CONFIG`, else
    `./config.yaml` when present. `flag_overrides` are CLI values —
    None means "flag not given" and falls through."""
    env = os.environ if env is None else env
    path = (config_file or env.get(ENV_PREFIX + "CONFIG")
            or (DEFAULT_CONFIG_FILE if os.path.exists(DEFAULT_CONFIG_FILE) else None))
    file_vals = _read_config_file(path) if path else {}

    cfg = EngineConfig()
    for name in EngineConfig.field_names():
        if name in file_vals and file_vals[name] is not None:
            setattr(cfg, name, file_vals[name])
        env_key = ENV_PREFIX + name.upper()
        if env.get(env_key):
            setattr(cfg, name, env[env_key])
        flag = flag_overrides.get(name)
        if flag is not None:
            setattr(cfg, name, flag)
    # reference secret channel: MONGO_CONNECTION_STRING env var
    # (src/cli/mongo_update.py:65) — wins over file, loses to the flag
    if (flag_overrides.get("mongo_uri") is None
            and not env.get(ENV_PREFIX + "MONGO_URI")
            and env.get("MONGO_CONNECTION_STRING")):
        cfg.mongo_uri = env["MONGO_CONNECTION_STRING"]
    if cfg.n_partitions is not None:
        cfg.n_partitions = int(cfg.n_partitions)
    if cfg.stream_state_partitions is not None:
        cfg.stream_state_partitions = int(cfg.stream_state_partitions)
    return cfg
