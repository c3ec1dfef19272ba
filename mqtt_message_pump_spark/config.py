"""INI-driven configuration, mirroring the reference's config surface.

The reference loads a 10-section INI file into a struct (reference
``conf.go:7-18``, loader ``config.go:24-43`` with ``~`` expansion) and the
``show`` CLI echoes it (``main.go:29-31``).  We reproduce the same sections
and keys with a dataclass per section, plus defaults matching the example
configs under ``docker/2020.01.28/conf/``.  Keys the Spark engine does not
need (ClickHouse DSN pieces) are still parsed so a reference config file
loads unchanged.
"""

from __future__ import annotations

import configparser
import os
from dataclasses import dataclass, field, fields


@dataclass
class MqttConf:
    """One MQTT endpoint (reference has `source-mqtt` and `monitor-mqtt`)."""

    server: str = "tcp://127.0.0.1:1883"
    username: str = ""
    password: str = ""
    qos: int = 0
    clean_session: bool = True
    client_name: str = "pump"


@dataclass
class TopicConf:
    topic_root: str = ""
    topic_prefix: str = ""
    enable_group_num: bool = False
    group_num: int = 0


@dataclass
class StoreConf:
    """Sink configuration.  ``format`` extends the reference: parquet (the
    default, needs no server) or jdbc (ClickHouse parity path)."""

    format: str = "parquet"
    path: str = "./pump_output"
    url: str = ""
    # JDBC driver class (e.g. com.clickhouse.jdbc.ClickHouseDriver).
    # Required in practice: jars added via spark.jars are not visible to
    # java.sql.DriverManager's ServiceLoader scan, so Spark must
    # Class.forName the driver explicitly.
    driver: str = ""
    database: str = "default"
    raw_table_name: str = "Raw_Message"
    adapter_table_name: str = "Json_Message"
    compress: bool = True


@dataclass
class AdapterConf:
    name: str = "Multi-Record Cascading Tile Adapter"
    json_sample: str = ""


@dataclass
class MonitorConf:
    publish_interval_secs: int = 5
    topic_root: str = "pump-monitor"
    target: str = "pump"


@dataclass
class BatchConf:
    """Micro-batch trigger, mirroring the 64-row / 5-s flush of the
    reference (``data_dbstore.go:18-19``)."""

    commit_interval_secs: int = 5
    max_items: int = 64
    mid_length: int = 8


@dataclass
class PumpConfig:
    source_mqtt: MqttConf = field(default_factory=MqttConf)
    monitor_mqtt: MqttConf = field(default_factory=MqttConf)
    topic: TopicConf = field(default_factory=TopicConf)
    store: StoreConf = field(default_factory=StoreConf)
    adapter: AdapterConf = field(default_factory=AdapterConf)
    monitor: MonitorConf = field(default_factory=MonitorConf)
    batch: BatchConf = field(default_factory=BatchConf)

    def info(self) -> str:
        """Formatted dump, the `show` command analog."""
        lines = []
        for f in fields(self):
            section = getattr(self, f.name)
            lines.append(f"[{f.name}]")
            for sf in fields(section):
                lines.append(f"  {sf.name} = {getattr(section, sf.name)}")
        return "\n".join(lines)


_SECTION_MAP = {
    "source-mqtt": "source_mqtt",
    "monitor-mqtt": "monitor_mqtt",
    "topic": "topic",
    "store": "store",
    "adapter": "adapter",
    "monitor": "monitor",
    "batch": "batch",
}

_KEY_MAP = {
    "cleansession": "clean_session",
    "clientname": "client_name",
    "topicroot": "topic_root",
    "topicprefix": "topic_prefix",
    "enablegroupnum": "enable_group_num",
    "groupnum": "group_num",
    "rawtablename": "raw_table_name",
    "adaptertablename": "adapter_table_name",
    "jsonsample": "json_sample",
    "publishinterval": "publish_interval_secs",
    "commitinterval": "commit_interval_secs",
    "maxitems": "max_items",
    "midlength": "mid_length",
}


def load_config(path: str) -> PumpConfig:
    """Load an INI file; unknown sections/keys are ignored, `~` expanded."""
    path = os.path.expanduser(path)
    parser = configparser.ConfigParser()
    with open(path) as fh:
        parser.read_string(fh.read())
    cfg = PumpConfig()
    for raw_section in parser.sections():
        attr = _SECTION_MAP.get(raw_section.lower())
        if attr is None:
            continue
        section = getattr(cfg, attr)
        valid = {f.name: f for f in fields(section)}
        for raw_key, raw_val in parser.items(raw_section):
            key = _KEY_MAP.get(raw_key.lower(), raw_key.lower())
            f = valid.get(key)
            if f is None:
                continue
            if f.type in ("int", int):
                val: object = int(raw_val)
            elif f.type in ("bool", bool):
                val = raw_val.strip().lower() in ("1", "true", "yes", "on")
            else:
                val = os.path.expanduser(raw_val)
            setattr(section, key, val)
    return cfg
