"""Property-based encode→decode round-trips (hypothesis) for the LogLine
wire formats — the golden tests pin exact bytes; these pin the inverse
relation over the whole value space."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from syslog_kafka_spark.encode.avro_binary import encode_logline, encode_logline_confluent
from syslog_kafka_spark.encode.decode import (
    decode_confluent,
    decode_logline,
    decode_logline_proto,
)
from syslog_kafka_spark.encode.proto_wire import encode_logline_proto

text = st.text(max_size=80)
long64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)

logline_records = st.fixed_dictionaries(
    {
        "line": st.one_of(st.none(), text),
        "source": st.one_of(st.none(), text),
        "tag": st.one_of(st.none(), st.dictionaries(st.text(min_size=1, max_size=20), text, max_size=5)),
        "logtypeid": st.one_of(st.none(), long64),
        "timings": st.one_of(
            st.none(),
            st.lists(
                st.fixed_dictionaries({"eventName": text, "value": long64}), max_size=4
            ),
        ),
    }
)


@given(logline_records)
@settings(max_examples=200, deadline=None)
def test_avro_roundtrip(rec):
    assert decode_logline(encode_logline(rec)) == rec


@given(logline_records, st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=50, deadline=None)
def test_confluent_roundtrip(rec, schema_id):
    sid, out = decode_confluent(encode_logline_confluent(rec, schema_id))
    assert sid == schema_id and out == rec


proto_records = st.fixed_dictionaries(
    {
        "line": text,  # required in proto
        "source": st.one_of(st.none(), text),
        "tag": st.one_of(
            st.none(), st.dictionaries(st.text(min_size=1, max_size=20), text, min_size=1, max_size=5)
        ),
        "logtypeid": st.one_of(st.none(), long64),
        "timings": st.one_of(st.none(), st.lists(long64, min_size=1, max_size=4)),
    }
)


@given(proto_records)
@settings(max_examples=200, deadline=None)
def test_proto_roundtrip(rec):
    out = decode_logline_proto(encode_logline_proto(rec))
    expect = dict(rec)
    # encoder writes sorted tag keys; decoder returns insertion order — compare as dicts
    assert out == expect
