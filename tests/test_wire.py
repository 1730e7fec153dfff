"""Protobuf wire serde: round-trip, spec compliance, forward compatibility."""

from messikinesisprovider_spark.ulid import Ulid
from messikinesisprovider_spark.wire import (
    _varint,
    decode_message,
    encode_column,
    encode_message,
)


def _sample():
    u = Ulid.of(1700000000123, 987654321)
    return {
        "ulid_msb": u.msb,
        "ulid_lsb": u.lsb,
        "partition_key": "pk1",
        "ordering_group": "g1",
        "ordering_seq": 42,
        "external_id": "ext-9",
        "data": {"payload1": b"\x01\x02", "payload2": b"\xff" * 5},
        "attributes": {"k1": "v1", "k2": "v2"},
        "timestamp_ms": 1700000000123,
        "source_client_id": "client-7",
    }


def test_roundtrip_all_fields():
    msg = _sample()
    decoded = decode_message(encode_message(msg))
    for k in ("partition_key", "ordering_group", "ordering_seq", "external_id",
              "timestamp_ms", "source_client_id", "ulid_msb", "ulid_lsb"):
        assert decoded[k] == msg[k], k
    assert decoded["data"] == {"payload1": b"\x01\x02", "payload2": b"\xff" * 5}
    assert decoded["attributes"] == {"k1": "v1", "k2": "v2"}
    assert decoded["ulid"] == Ulid.of(1700000000123, 987654321).text()


def test_varint_spec_values():
    # protobuf spec examples
    assert _varint(0) == b"\x00"
    assert _varint(1) == b"\x01"
    assert _varint(127) == b"\x7f"
    assert _varint(128) == b"\x80\x01"
    assert _varint(300) == b"\xac\x02"
    # negative int64 encodes as 10-byte two's complement
    assert len(_varint(-1)) == 10


def test_negative_msb_roundtrip():
    # ULIDs with the sign bit set in msb (timestamps far future / high bits)
    u = Ulid.of((1 << 48) - 1, (1 << 80) - 1)
    assert u.msb < 0
    decoded = decode_message(encode_message({"ulid_msb": u.msb, "ulid_lsb": u.lsb}))
    assert decoded["ulid_msb"] == u.msb and decoded["ulid_lsb"] == u.lsb


def test_unknown_fields_skipped():
    # forward compatibility: append an unknown length-delimited field 15
    buf = encode_message({"partition_key": "pk"}) + bytes([15 << 3 | 2, 3]) + b"xyz"
    decoded = decode_message(buf)
    assert decoded["partition_key"] == "pk"


def test_encode_column_on_log(spark, tmp_path):
    from datetime import datetime, timezone

    from messikinesisprovider_spark.log import MessiLog
    from messikinesisprovider_spark.cursor import MessiCursor

    log = MessiLog(spark, str(tmp_path / "wlog"), n_shards=1)
    log.publish(
        "t",
        [{"partition_key": "pk", "external_id": "a", "attributes": {"x": "1"}}],
        now=datetime(2026, 1, 1, tzinfo=timezone.utc),
    )
    df = encode_column(log.read(MessiCursor.oldest()))
    [row] = df.select("wire", "external_id", "ulid_msb", "ulid_lsb").collect()
    decoded = decode_message(bytes(row["wire"]))
    assert decoded["external_id"] == "a"
    assert decoded["attributes"] == {"x": "1"}
    assert decoded["ulid_msb"] == row["ulid_msb"]
