"""Micro-benchmark: compact_removals' posting strip, vectorized vs the
former per-row shape (VERDICT r4 done-criterion for next#4).

Generates a synthetic postings batch the size of a ~100-shard
compaction input (rows = (term, block) pairs with varbyte payloads),
plus a removal set hitting a fraction of docs, and times:

- the CURRENT kernel: builder.compact_removals' segmented whole-batch
  strip (one concatenated varbyte decode + one searchsorted + one batch
  re-encode per batch), invoked through the same mapInPandas closure;
- the FORMER shape, reconstructed here verbatim (per-row itertuples +
  per-row codec calls), as the baseline.

Both produce identical output rows (asserted). Run:
    python tools/strip_bench.py [n_rows] [postings_per_row]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from miru_spark.index import codec  # noqa: E402


def synth_batch(n_rows: int, per_row: int, block_bits: int = 13, seed: int = 7):
    rng = np.random.default_rng(seed)
    rows = {c: [] for c in ("term", "block_key", "n", "sum_tf", "max_doc_id",
                            "max_tf", "codec", "doc_ids", "tfs", "shard")}
    all_ids = []
    for i in range(n_rows):
        bk = i // 997  # unique (term, block_key) like a real shard
        base = bk << block_bits
        offs = np.sort(rng.choice(1 << block_bits, size=per_row, replace=False))
        ids = base + offs.astype(np.int64)
        tfs = rng.integers(1, 9, size=per_row).astype(np.int64)
        all_ids.append(ids)
        d = np.empty_like(ids)
        d[0] = ids[0] - base
        d[1:] = np.diff(ids)
        rows["term"].append(f"t{i % 997:04d}")
        rows["block_key"].append(bk)
        rows["n"].append(np.int32(per_row))
        rows["sum_tf"].append(int(tfs.sum()))
        rows["max_doc_id"].append(int(ids[-1]))
        rows["max_tf"].append(np.int32(tfs.max()))
        rows["codec"].append(np.int8(codec.CODEC_VARBYTE))
        rows["doc_ids"].append(codec.varbyte_encode(d.astype(np.uint64)))
        rows["tfs"].append(codec.varbyte_encode(tfs.astype(np.uint64)))
        rows["shard"].append(i % 100)
    pdf = pd.DataFrame(rows)
    uniq = np.unique(np.concatenate(all_ids))
    removed = np.sort(rng.choice(uniq, size=max(1, len(uniq) // 20),
                                 replace=False))
    return pdf, removed


class _FakeBroadcast:
    def __init__(self, v):
        self.value = v


def old_strip(pdf_iter, rem_b, block_bits):
    """The former per-row shape (builder.py pre-round-4), verbatim."""
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        rem = rem_b.value
        out_rows = {c: [] for c in pdf.columns}
        for row in pdf.itertuples(index=False):
            base = int(row.block_key) << block_bits
            if int(row.codec) == codec.CODEC_RLE:
                ids = codec.decode_block_runs(row.doc_ids, base)
            else:
                ids = np.cumsum(
                    codec.varbyte_decode(row.doc_ids).astype(np.int64)
                ) + base
            pos = np.searchsorted(rem, ids)
            pos[pos == len(rem)] = 0
            keep = rem[pos] != ids
            if keep.all():
                for c in pdf.columns:
                    out_rows[c].append(getattr(row, c))
                continue
            ids2 = ids[keep]
            if ids2.size == 0:
                continue
            tfs2 = codec.varbyte_decode(row.tfs).astype(np.int64)[keep]
            n_runs = int(np.count_nonzero(np.diff(ids2) != 1)) + 1
            use_rle = 2 * n_runs < ids2.size
            if use_rle:
                id_buf = codec.encode_block_runs(ids2, base)
            else:
                id_buf = codec.encode_block_docids(ids2, base)
            vals = {
                "term": row.term, "block_key": row.block_key,
                "n": np.int32(ids2.size), "sum_tf": int(tfs2.sum()),
                "max_doc_id": int(ids2[-1]), "max_tf": np.int32(tfs2.max()),
                "codec": np.int8(codec.CODEC_RLE if use_rle else codec.CODEC_VARBYTE),
                "doc_ids": id_buf,
                "tfs": codec.varbyte_encode(tfs2.astype(np.uint64)),
                "shard": row.shard,
            }
            for c in pdf.columns:
                out_rows[c].append(vals[c])
        yield pd.DataFrame(out_rows, columns=list(pdf.columns))


def new_strip(pdf_iter, rem_b, block_bits):
    """Invoke the CURRENT kernel by reconstructing its closure from
    builder.compact_removals' source shape (same code path the real
    compaction runs through mapInPandas)."""
    import inspect
    import textwrap

    from miru_spark.index import builder as B

    src = inspect.getsource(B.compact_removals)
    fn_src = src.split("def _strip_postings", 1)[1]
    # cut at the next sibling def
    body = "def _strip_postings" + fn_src.split("\n    def ", 1)[0]
    ns = {"np": np, "pd": pd, "codec": codec, "rem_b": rem_b,
          "block_bits": block_bits, "_group_slices": B._group_slices}
    exec(textwrap.dedent(body), ns)  # noqa: S102 - benching our own source
    return ns["_strip_postings"](pdf_iter)


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    per_row = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    block_bits = 13
    pdf, removed = synth_batch(n_rows, per_row, block_bits)
    rem_b = _FakeBroadcast(removed)

    t0 = time.monotonic()
    new_out = pd.concat(list(new_strip(iter([pdf]), rem_b, block_bits)),
                        ignore_index=True)
    t_new = time.monotonic() - t0

    t0 = time.monotonic()
    old_out = pd.concat(list(old_strip(iter([pdf]), rem_b, block_bits)),
                        ignore_index=True)
    t_old = time.monotonic() - t0

    assert len(new_out) == len(old_out)
    # the new kernel groups unchanged/changed rows; compare as SETS of
    # rows (row content identical, order is not part of the contract —
    # the parquet write re-sorts by partition anyway)
    key = ["term", "block_key"]
    new_out = new_out.sort_values(key).reset_index(drop=True)
    old_out = old_out.sort_values(key).reset_index(drop=True)
    for c in ("term", "block_key", "n", "sum_tf", "max_doc_id", "max_tf",
              "codec", "doc_ids", "tfs", "shard"):
        assert list(new_out[c]) == list(old_out[c]), c

    print(f"rows={n_rows} postings/row={per_row} removed={len(removed)}")
    print(f"old per-row strip: {t_old:.2f}s   new segmented strip: {t_new:.2f}s"
          f"   speedup: {t_old / t_new:.1f}x   (outputs identical)")


if __name__ == "__main__":
    main()
