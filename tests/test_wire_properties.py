"""Property-based wire-serde and cursor-order tests (hypothesis).

The hand-rolled protobuf envelope serde (wire.py) is the one place a
byte-level bug silently corrupts data at the broker boundary, so beyond the
golden round-trip tests it gets generative coverage: arbitrary field values,
arbitrary binary payloads, and arbitrary trailing unknown fields must
round-trip or be skipped, never corrupt."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from messikinesisprovider_spark.cursor import MessiCursor
from messikinesisprovider_spark.wire import _varint, decode_message, encode_message

_text = st.text(alphabet=string.printable, max_size=40)
_key = st.text(alphabet=string.ascii_lowercase + string.digits, min_size=1, max_size=12)


@st.composite
def messages(draw):
    return {
        "ulid_msb": draw(st.integers(min_value=-(2**63), max_value=2**63 - 1)),
        "ulid_lsb": draw(st.integers(min_value=-(2**63), max_value=2**63 - 1)),
        "partition_key": draw(_text),
        "ordering_group": draw(_text),
        "ordering_seq": draw(st.integers(min_value=0, max_value=2**62)),
        "external_id": draw(_text),
        "data": draw(
            st.dictionaries(_key, st.binary(max_size=64), max_size=4)
        ),
        "attributes": draw(st.dictionaries(_key, _text, max_size=4)),
        "timestamp_ms": draw(st.integers(min_value=0, max_value=2**62)),
        "source_client_id": draw(_text),
    }


@settings(max_examples=200, deadline=None)
@given(messages())
def test_wire_roundtrip_property(msg):
    decoded = decode_message(encode_message(msg))
    for k, v in msg.items():
        assert decoded[k] == v, k


@settings(max_examples=100, deadline=None)
@given(
    messages(),
    st.integers(min_value=16, max_value=30),  # unknown field numbers
    st.sampled_from([0, 1, 2, 5]),  # every skippable wire type
    st.binary(min_size=8, max_size=16),
)
def test_wire_skips_arbitrary_unknown_fields(msg, field_no, wt, payload):
    buf = bytearray(encode_message(msg))
    tag = (field_no << 3) | wt
    buf += _varint(tag)
    if wt == 0:
        buf += _varint(12345)
    elif wt == 1:
        buf += payload[:8]
    elif wt == 2:
        buf += _varint(len(payload)) + payload
    else:  # wt == 5
        buf += payload[:4]
    decoded = decode_message(bytes(buf))
    for k, v in msg.items():
        assert decoded[k] == v, k


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**40),
    st.integers(min_value=0, max_value=2**40),
    st.booleans(),
    st.booleans(),
)
def test_cursor_total_order_properties(seq_a, seq_b, inc_a, inc_b):
    a = MessiCursor.at_sequence("shard-0", seq_a, inclusive=inc_a)
    b = MessiCursor.at_sequence("shard-0", seq_b, inclusive=inc_b)
    # antisymmetry + totality
    assert (a.compare_to(b) == 0) == (b.compare_to(a) == 0)
    assert (a.compare_to(b) < 0) == (b.compare_to(a) > 0)
    # consistency with the position semantics: lower sequence starts earlier;
    # at equal sequence, inclusive starts earlier than exclusive
    if seq_a < seq_b:
        assert a.compare_to(b) < 0
    elif seq_a == seq_b and inc_a == inc_b:
        assert a.compare_to(b) == 0
    # serde round-trip preserves order exactly
    a2 = MessiCursor.from_checkpoint(a.checkpoint())
    assert a2.compare_to(b) == a.compare_to(b)
