"""Per-partition lineage manifests: the checkpoint/resume store.

Layout under the pipeline output root::

    out/
      mentions/part=K/*.parquet     # committed stage output, one dir per part
      triples/part=K/*.parquet
      _manifest/part=K.json         # written LAST: commit marker + counters

A partition is committed iff its manifest exists; the manifest is written
only after the partition's parquet output is fully on disk, so a killed run
leaves at worst orphan parquet under uncommitted partitions.  The next run
DELETES those uncommitted ``part=K`` dirs before reprocessing the wave
(``kg._clear_uncommitted_parts``) — parquet writers append uniquely-named
files, so overwrite-by-rerun alone would duplicate rows.  On restart,
committed partition ids are excluded from the
input *before the DAG is built* (prune at the read — the reference has no
comparable mechanism, SURVEY.md §4.3.4).
"""

from __future__ import annotations

import json
import pathlib
import time


def manifest_dir(out_dir: str | pathlib.Path) -> pathlib.Path:
    return pathlib.Path(out_dir) / "_manifest"


def committed_parts(out_dir: str | pathlib.Path) -> set[int]:
    mdir = manifest_dir(out_dir)
    if not mdir.is_dir():
        return set()
    return {
        int(p.stem.split("=", 1)[1])
        for p in mdir.glob("part=*.json")
    }


def write_manifest(
    out_dir: str | pathlib.Path, part: int, counters: dict
) -> None:
    mdir = manifest_dir(out_dir)
    mdir.mkdir(parents=True, exist_ok=True)
    payload = dict(counters)
    payload["part"] = part
    payload["committed_at"] = time.time()
    tmp = mdir / f".part={part}.json.tmp"
    tmp.write_text(json.dumps(payload, indent=1))
    tmp.rename(mdir / f"part={part}.json")  # atomic commit marker


def read_manifests(out_dir: str | pathlib.Path) -> list[dict]:
    mdir = manifest_dir(out_dir)
    if not mdir.is_dir():
        return []
    return [
        json.loads(p.read_text()) for p in sorted(mdir.glob("part=*.json"))
    ]


def parquet_rows(path: str | pathlib.Path) -> int:
    """Row count from parquet footers only (no data read)."""
    import pyarrow.parquet as pq

    root = pathlib.Path(path)
    if not root.exists():
        return 0
    total = 0
    for f in root.rglob("*.parquet"):
        total += pq.ParquetFile(f).metadata.num_rows
    return total
