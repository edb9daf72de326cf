import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from miru_spark.index import codec


@given(st.lists(st.integers(min_value=0, max_value=2**62 - 1), min_size=0, max_size=500))
@settings(max_examples=100, deadline=None)
def test_varbyte_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert (codec.varbyte_decode(codec.varbyte_encode(arr)) == arr).all()


@given(
    st.sets(st.integers(min_value=0, max_value=10**7), min_size=1, max_size=300),
    st.integers(min_value=0, max_value=100),
)
@settings(max_examples=60, deadline=None)
def test_docid_block_roundtrip(ids, base_offset):
    ids = np.array(sorted(ids), dtype=np.int64)
    base = max(0, int(ids[0]) - base_offset)
    buf = codec.encode_block_docids(ids, base)
    assert (codec.decode_block_docids(buf, base) == ids).all()


def test_compression_ratio_dense_ids():
    # dense ascending ids (gap 1) should cost ~1 byte per id
    ids = np.arange(5000, 13192, dtype=np.int64)
    buf = codec.encode_block_docids(ids, 5000)
    assert len(buf) <= ids.size + 2


def test_empty():
    assert codec.varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert codec.varbyte_decode(b"").size == 0
