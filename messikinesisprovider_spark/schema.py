"""The MessiMessage envelope as a Spark StructType.

Field-for-field rebuild of the protobuf envelope observable in the reference
(field evidence: MessiClientTck.java:70-113; provenance enrichment:
KinesisStreamingBuffer.java:178-207). Fixed envelope, dynamic payload: the
`data` map carries opaque named binary payloads; the engine never infers
payload schemas (same contract as the reference).
"""

from __future__ import annotations

from pyspark.sql import types as T

PROVIDER_SCHEMA = T.StructType(
    [
        T.StructField("technology", T.StringType(), True),
        T.StructField("published_ts", T.LongType(), True),  # epoch millis
        T.StructField("shard_id", T.StringType(), True),
        T.StructField("sequence_number", T.StringType(), True),
    ]
)

MESSAGE_SCHEMA = T.StructType(
    [
        # 128-bit ULID, time-sortable identity (KinesisMessiProducer.java:68-80)
        T.StructField("ulid_msb", T.LongType(), False),
        T.StructField("ulid_lsb", T.LongType(), False),
        T.StructField("ulid", T.StringType(), False),  # canonical 26-char form
        # shard routing key — publish rejects null (KinesisMessiProducer.java:64-66)
        T.StructField("partition_key", T.StringType(), False),
        # logical topic multiplexed within one stream (KinesisMessiTopic.java:61)
        T.StructField("topic", T.StringType(), False),
        T.StructField("external_id", T.StringType(), True),
        T.StructField("ordering_group", T.StringType(), True),
        T.StructField("ordering_seq", T.LongType(), True),
        # client/business event time (MessiClientTck.java:93)
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("data", T.MapType(T.StringType(), T.BinaryType()), True),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), True),
        # first-hop provenance, set once (KinesisStreamingBuffer.java:186-193)
        T.StructField("first_provider", PROVIDER_SCHEMA, True),
        # current-hop provenance, overwritten on every read (:194-201)
        T.StructField("provider", PROVIDER_SCHEMA, True),
        T.StructField("source_client_id", T.StringType(), True),
    ]
)

# Broker-side columns the log adds (simulator evidence KinesisShardStream.java:30-33)
LOG_SCHEMA = T.StructType(
    list(MESSAGE_SCHEMA.fields)
    + [
        T.StructField("shard_id", T.StringType(), False),
        T.StructField("sequence_number", T.LongType(), False),  # monotone per shard
        T.StructField("arrival_ts", T.TimestampType(), False),
    ]
)

# Zero-padded 12-digit wire form of a sequence number, as the simulator
# renders it (KinesisShardStream.java:30-33).
def format_sequence(seq: int) -> str:
    return f"{seq:012d}"


def parse_sequence(s: str) -> int:
    return int(s)
