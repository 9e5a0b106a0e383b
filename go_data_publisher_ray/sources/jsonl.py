"""JSONL (NDJSON) wire-format shim for the change log.

The reference's events travel as JSON over Kafka with binary payloads
base64-encoded in strings (M1/M2,
`transactions-producer/external/archiver/client.go:56-85`,
`transactions-producer/external/kafka/client.go:69`).  This module is
the compatibility seam for that format: epoch-partitioned ``.jsonl``
files convert to/from the engine's native epoch-partitioned parquet
(binary stays binary inside the engine — the transcode exists only at
the ingestion boundary, by design).

Conversion is per epoch-chunk file via pyarrow's C++ NDJSON reader;
``warc_ts`` travels as int64 epoch-micros so no timestamp-format
ambiguity exists between producers.
"""

from __future__ import annotations

import base64
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.json as pj
import pyarrow.parquet as pq


def _table_to_jsonl(table: pa.Table, path: str) -> None:
    cols = {name: table.column(name).to_pylist() for name in table.schema.names}
    n = table.num_rows
    ts = table.column("warc_ts").cast(pa.int64()).to_pylist()
    with open(path, "w") as f:
        for i in range(n):
            rec = {
                "lsn": cols["lsn"][i],
                "epoch": cols["epoch"][i],
                "op": cols["op"][i],
                "url": cols["url"][i],
                "warc_ts_us": ts[i],
                "html_b64": base64.b64encode(cols["html"][i]).decode("ascii"),
                "text": cols["text"][i],
                "lang": cols["lang"][i],
            }
            if "fetch_status" in cols:
                rec["fetch_status"] = cols["fetch_status"][i]
            f.write(json.dumps(rec) + "\n")


def _jsonl_to_table(path: str) -> pa.Table:
    t = pj.read_json(path)
    html = pa.array(
        [base64.b64decode(s) for s in t.column("html_b64").to_pylist()],
        type=pa.binary(),
    )
    out = {
        "lsn": t.column("lsn").cast(pa.int64()),
        "epoch": t.column("epoch").cast(pa.int32()),
        "op": t.column("op"),
        "url": t.column("url"),
        "warc_ts": t.column("warc_ts_us").cast(pa.int64()).cast(pa.timestamp("us")),
        "html": html,
        "text": t.column("text"),
        "lang": t.column("lang"),
    }
    if "fetch_status" in t.schema.names:
        out["fetch_status"] = t.column("fetch_status").cast(pa.int32())
    return pa.table(out)


def parquet_events_to_jsonl(events_dir: str, out_dir: str | None = None) -> str:
    out_dir = out_dir or events_dir.rstrip("/") + "_jsonl"
    for name in sorted(os.listdir(events_dir)):
        if not name.startswith("epoch="):
            continue
        src = os.path.join(events_dir, name)
        dst = os.path.join(out_dir, name)
        os.makedirs(dst, exist_ok=True)
        for f in sorted(os.listdir(src)):
            if f.endswith(".parquet"):
                _table_to_jsonl(
                    pq.read_table(os.path.join(src, f)),
                    os.path.join(dst, f.replace(".parquet", ".jsonl")),
                )
    return out_dir


def jsonl_events_to_parquet(jsonl_dir: str, out_dir: str | None = None) -> str:
    """Decode a JSONL change log into the engine's native epoch-
    partitioned parquet layout (idempotent: skips existing files)."""
    out_dir = out_dir or jsonl_dir.rstrip("/") + "_parquet"
    for name in sorted(os.listdir(jsonl_dir)):
        if not name.startswith("epoch="):
            continue
        src = os.path.join(jsonl_dir, name)
        dst = os.path.join(out_dir, name)
        os.makedirs(dst, exist_ok=True)
        for f in sorted(os.listdir(src)):
            if f.endswith(".jsonl"):
                target = os.path.join(dst, f.replace(".jsonl", ".parquet"))
                if os.path.exists(target):
                    continue
                table = _jsonl_to_table(os.path.join(src, f))
                tmp = target + ".tmp"
                pq.write_table(table, tmp)
                os.replace(tmp, target)
    return out_dir
