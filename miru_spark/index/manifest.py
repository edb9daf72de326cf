"""Per-shard lineage manifests — the engine's checkpoint/resume layer.

Reference analogue: miru persists a sip cursor per partition and plugin
custom cursors so index builds resume where they stopped (reference:
miru-api ``.../wal/AmzaSipCursor.java:14-47``; miru-stream-plugins
``.../fulltext/FullTextGatherer.java:205-243``). Here each shard build
writes a JSON manifest {shard, doc range, counts, checksum, status}; a
re-run skips shards whose manifest says ``done`` and whose input
fingerprint matches.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field


@dataclass
class ShardManifest:
    shard: int
    doc_lo: int
    doc_hi: int  # inclusive
    status: str = "pending"  # pending | done
    n_docs: int = 0
    n_postings: int = 0
    n_blocks: int = 0
    n_terms: int = 0
    sum_doclen: int = 0
    checksum: int = 0  # order-insensitive checksum over (term, block, max_doc_id)
    input_fingerprint: str = ""
    wall_sec: float = 0.0
    extra: dict = field(default_factory=dict)


def manifest_path(index_dir: str, shard: int) -> str:
    return os.path.join(index_dir, "manifests", f"shard_{shard:05d}.json")


def write_manifest(index_dir: str, m: ShardManifest) -> None:
    path = manifest_path(index_dir, m.shard)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(m), f, indent=1, sort_keys=True)
    os.replace(tmp, path)  # atomic: readers never see a torn manifest


def read_manifest(index_dir: str, shard: int) -> ShardManifest | None:
    path = manifest_path(index_dir, shard)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return ShardManifest(**json.load(f))


def shard_is_done(index_dir: str, shard: int, input_fingerprint: str) -> bool:
    m = read_manifest(index_dir, shard)
    if m is None or m.status != "done":
        return False
    # a compacted shard answers for every micro-batch it absorbed
    # (builder.compact_shards keeps the children's fingerprints), so a
    # replayed batch still no-ops after its shard was merged away
    return (
        m.input_fingerprint == input_fingerprint
        or input_fingerprint in m.extra.get("merged_fingerprints", [])
    )
