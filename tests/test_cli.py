"""CLI parity tests: show / check / run against a reference-style INI."""

from __future__ import annotations

import json

import pytest

from mqtt_message_pump_spark.cli import main

# the canonical sample from the reference example config
# (docker/2020.01.28/conf/pump-plus-emqx-example.ini:66)
SAMPLE = json.dumps(
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


@pytest.fixture
def ini(tmp_path):
    out = tmp_path / "out"
    path = tmp_path / "pump.ini"
    path.write_text(
        "[source-mqtt]\n"
        "server = tcp://127.0.0.1:1883\n"
        "qos = 1\n"
        "[topic]\n"
        "topicroot = JSON_Simulator/\n"
        "topicprefix = SimTest\n"
        "[store]\n"
        f"path = {out}\n"
        "rawtablename = Raw_Message\n"
        "adaptertablename = Json_Message\n"
        "[adapter]\n"
        f"jsonsample = {SAMPLE}\n"
        "[batch]\n"
        "commitinterval = 1\n"
    )
    return path


def test_show(ini, capsys):
    assert main(["show", str(ini)]) == 0
    out = capsys.readouterr().out
    assert "topic_root = JSON_Simulator/" in out
    assert "qos = 1" in out


def test_check_golden_columns(spark, ini, capsys):
    """The inferred column line must match the reference's golden log
    (release_20120128/readme.txt:40)."""
    assert main(["check", str(ini)]) == 0
    out = capsys.readouterr().out
    assert (
        "command String, key_id String, params_key String, "
        "params_thingKey String, params_ts String, params_value Float64"
        in out
    )
    assert "2 flattened row(s)" in out
    assert "check: OK" in out


def test_run_file_source(spark, ini, tmp_path, capsys):
    src = tmp_path / "drop"
    src.mkdir()
    msgs = [
        json.dumps(
            {
                "topic": "JSON_Simulator/SimTest/0",
                "payload": SAMPLE,
                "received_time": "2024-01-01T00:00:01.000Z",
            }
        )
        for _ in range(3)
    ]
    (src / "m.json").write_text("\n".join(msgs))
    assert (
        main(
            [
                "run",
                str(ini),
                "--source-dir",
                str(src),
                "--duration-secs",
                "8",
            ]
        )
        == 0
    )
    out_dir = tmp_path / "out"
    raw = spark.read.parquet(str(out_dir / "raw_message"))
    flat = spark.read.parquet(str(out_dir / "json_message"))
    assert raw.count() == 3
    # two records per sample payload, flattened
    assert flat.count() == 6
    assert "params_thingKey" in flat.columns
