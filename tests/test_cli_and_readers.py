"""CLI validation parity (R22) + schema-on-read smoke tests (§2B.1)."""

from __future__ import annotations

import json

import pytest

from syslog_kafka_spark.__main__ import parse_args, validate
from syslog_kafka_spark.sources.readers import read_csv, read_json, read_text


def test_cli_requires_broker_and_topic(capsys):
    with pytest.raises(SystemExit):
        validate(parse_args(["--topic", "t"]))
    with pytest.raises(SystemExit):
        validate(parse_args(["--broker.list", "b:9092"]))


def test_cli_avro_requires_registry():
    with pytest.raises(SystemExit):
        validate(parse_args(["--broker.list", "b:9092", "--topic", "t", "--avro"]))


def test_cli_tag_parsing():
    out = validate(
        parse_args(
            ["--broker.list", "b:9092", "--topic", "t", "--tag", "dc=ams", "--tag", "env=prod"]
        )
    )
    assert out["tags"] == {"dc": "ams", "env": "prod"}
    assert out["encoding"] == "string"
    with pytest.raises(SystemExit):
        validate(parse_args(["--broker.list", "b", "--topic", "t", "--tag", "noequals"]))


def test_cli_encoding_selection():
    base = ["--broker.list", "b:9092", "--topic", "t"]
    assert validate(parse_args(base))["encoding"] == "string"
    assert validate(parse_args([*base, "--proto"]))["encoding"] == "proto"
    assert (
        validate(parse_args([*base, "--avro", "--schema.registry.url", "http://r"]))["encoding"]
        == "avro"
    )


def test_read_text_csv_json(spark, tmp_path):
    (tmp_path / "f.txt").write_text("line one\nline two\n")
    assert read_text(spark, str(tmp_path / "f.txt")).count() == 2

    (tmp_path / "f.csv").write_text("a,b\n1,x\n2,y\n")
    csv = read_csv(spark, str(tmp_path / "f.csv"))
    assert csv.columns == ["a", "b"] and csv.count() == 2
    assert csv.schema["a"].dataType.typeName() in ("integer", "long")  # inferSchema on

    rows = [{"k": 1, "s": "x"}, {"k": 2, "s": "y"}]
    (tmp_path / "f.json").write_text("\n".join(json.dumps(r) for r in rows))
    js = read_json(spark, str(tmp_path / "f.json"))
    assert sorted(js.columns) == ["k", "s"] and js.count() == 2
