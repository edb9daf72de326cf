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


def test_rle_roundtrip_dense_and_gappy():
    import numpy as np

    from miru_spark.index import codec

    # fully dense block
    ids = np.arange(1000, 9192, dtype=np.int64)
    buf = codec.encode_block_runs(ids, base=1000)
    assert len(buf) < 8  # two varbytes: gap 0, run 8192
    out = codec.decode_block_runs(buf, base=1000)
    assert np.array_equal(out, ids)
    # gappy runs
    ids2 = np.concatenate([np.arange(0, 10), np.arange(50, 60), np.array([99])])
    buf2 = codec.encode_block_runs(ids2, base=0)
    assert np.array_equal(codec.decode_block_runs(buf2, base=0), ids2)
    # dispatch
    assert np.array_equal(
        codec.decode_block_docids_codec(buf2, 0, codec.CODEC_RLE), ids2)


def test_rle_roundtrip_property():
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from miru_spark.index import codec

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(0, 8191), min_size=1, max_size=300, unique=True),
           st.integers(0, 2**40))
    def check(vals, base_blocks):
        base = base_blocks << 13
        ids = np.array(sorted(vals), dtype=np.int64) + base
        buf = codec.encode_block_runs(ids, base)
        assert np.array_equal(codec.decode_block_runs(buf, base), ids)

    check()
