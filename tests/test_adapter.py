"""Adapter-core parity tests: golden-log schema inference, explode/flatten
semantics, drift warning, id shape, config loader.

The golden oracle is the reference's captured check-run transcript
(`/root/reference/release_20120128/readme.txt:40`): feeding the example
config's jsonsample through inference must yield exactly
``command String, key_id String, params_key String, params_thingKey String,
params_ts String, params_value Float64``.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mqtt_message_pump_spark.config import PumpConfig, load_config
from mqtt_message_pump_spark.functions.flatten import explode_records, flatten_struct
from mqtt_message_pump_spark.functions.ids import with_message_id
from mqtt_message_pump_spark.functions.inference import (
    SchemaDrift,
    flat_schema_to_struct,
    infer_flat_schema,
    infer_spark_schema,
)

# The example jsonsample from the reference config
# (docker/2020.01.28/conf/pump-plus-emqx-example.ini:66), reconstructed.
GOLDEN_SAMPLE = json.dumps(
    {
        "1": {
            "command": "property.publish",
            "params": {
                "thingKey": "545420B443E8455335363335520C6E6B",
                "ts": "2020-01-05T20:31:00Z",
                "key": "ut",
                "value": 564,
            },
        },
        "2": {
            "command": "property.publish",
            "params": {
                "thingKey": "545420B443E8455335363335520C7777",
                "ts": "2020-01-06T21:31:00Z",
                "key": "ut",
                "value": 128,
            },
        },
    }
)

GOLDEN_COLUMNS = [
    ("command", "String"),
    ("key_id", "String"),
    ("params_key", "String"),
    ("params_thingKey", "String"),
    ("params_ts", "String"),
    ("params_value", "Float64"),
]


def test_golden_schema_inference():
    assert infer_flat_schema(GOLDEN_SAMPLE) == GOLDEN_COLUMNS


def test_golden_struct_types():
    struct = flat_schema_to_struct(infer_flat_schema(GOLDEN_SAMPLE))
    assert struct["params_value"].dataType == T.DoubleType()
    assert struct["params_ts"].dataType == T.StringType()  # ts stays opaque
    assert [f.name for f in struct.fields] == [c for c, _ in GOLDEN_COLUMNS]


def test_schema_drift_warns_first_wins():
    sample = json.dumps(
        {
            "1": {"a": 1, "b": "x"},
            "2": {"a": 1},  # missing key -> drift
        }
    )
    with pytest.warns(SchemaDrift):
        cols = infer_flat_schema(sample)
    assert cols == [("a", "Float64"), ("b", "String"), ("key_id", "String")]


def test_flatten_collision_last_wins():
    # a_b leaf vs a.b path both -> a_b; reference silently overwrites
    # (data_adapter.go:87), we mirror with a warning.
    sample = json.dumps({"1": {"a_b": 1, "a": {"b": 2}}})
    cols = infer_flat_schema(sample)
    assert cols == [("a_b", "Float64"), ("key_id", "String")]


def test_end_to_end_golden_pipeline(spark):
    """Full adapter path on the golden sample: 1 message with 2 records ->
    1 raw row + 2 flattened rows (FIXTURES.md A: expected cardinality)."""
    df = spark.createDataFrame(
        [("topic/a", GOLDEN_SAMPLE)], ["topic", "payload"]
    )
    map_schema = infer_spark_schema(spark, GOLDEN_SAMPLE)
    parsed = df.select(
        "topic", F.from_json("payload", map_schema).alias("records")
    )
    exploded = explode_records(parsed, "records")
    flat = flatten_struct(exploded, ["record"], sort_columns=True)
    rows = flat.orderBy("key_id").collect()
    assert len(rows) == 2
    assert flat.columns == ["topic", "key_id"] + [
        "command",
        "params_key",
        "params_thingKey",
        "params_ts",
        "params_value",
    ]
    assert rows[0]["key_id"] == "1"
    assert rows[0]["params_value"] == 564
    assert rows[1]["params_thingKey"] == "545420B443E8455335363335520C7777"


def test_message_id_shape(spark):
    df = spark.range(50).select(F.col("id"))
    out = with_message_id(df, "mid", 8).collect()
    ids = [r["mid"] for r in out]
    assert all(len(i) == 8 for i in ids)
    assert all(i.isupper() or i.isdigit() or i.isalnum() for i in ids)
    assert len(set(ids)) == len(ids)  # unique across rows


def test_message_id_deterministic(spark):
    df = spark.range(10)
    a = [r["mid"] for r in with_message_id(df, deterministic_from=["id"]).collect()]
    b = [r["mid"] for r in with_message_id(df, deterministic_from=["id"]).collect()]
    assert a == b


def test_config_loader(tmp_path):
    ini = tmp_path / "pump.ini"
    ini.write_text(
        """
[source-mqtt]
server = tcp://broker:1883
qos = 1
cleansession = false

[topic]
topicroot = Root/
topicprefix = Pre
enablegroupnum = true
groupnum = 4

[batch]
maxitems = 128
"""
    )
    cfg = load_config(str(ini))
    assert cfg.source_mqtt.server == "tcp://broker:1883"
    assert cfg.source_mqtt.qos == 1
    assert cfg.source_mqtt.clean_session is False
    assert cfg.topic.enable_group_num is True
    assert cfg.topic.group_num == 4
    assert cfg.batch.max_items == 128
    # untouched sections keep defaults
    assert cfg.batch.commit_interval_secs == 5
    assert "topic_root = Root/" in cfg.info()


def test_config_defaults_match_reference():
    cfg = PumpConfig()
    assert cfg.batch.max_items == 64  # data_dbstore.go:18
    assert cfg.batch.commit_interval_secs == 5  # data_dbstore.go:19
    assert cfg.adapter.name == "Multi-Record Cascading Tile Adapter"
