"""Binlog-tail driver loop + lineage/status API.

The analog of the reference's poll-loop publishers (1 s ticker,
`transactions-producer/domain/processor.go:59-74`) and of the
status-service RPC surface (`status-service/rpc/status_service.go:68-231`):

- ``tail``: poll the events directory for new (or grown) epochs and
  apply them in order; stop after ``max_idle_polls`` empty polls (tests
  / bounded runs) or run forever.
- ``status``: the progress/lineage view a status endpoint would serve —
  watermarks, committed intervals, gaps, per-partition checkpoints,
  schema version.
"""

from __future__ import annotations

import time

from ..state.manifest import Manifest
from .apply import apply_log, discover_epochs
from .verify import gap_scan


def tail(
    events_dir: str,
    lake_dir: str,
    *,
    poll_interval: float = 1.0,
    max_idle_polls: int | None = 3,
    salt: int = 0,
) -> list[dict]:
    """Apply new epochs as they appear; at-least-once + idempotent
    commits = effectively-once, exactly like the consumer loop
    (`transactions-consumer/consume/transaction_consumer.go:72-91`)."""
    results: list[dict] = []
    idle = 0
    while True:
        man = Manifest(lake_dir)
        done = set(man.committed_epochs())
        pending = [e for e in discover_epochs(events_dir) if e not in done]
        if pending:
            idle = 0
            results.extend(apply_log(events_dir, lake_dir, salt=salt))
        else:
            idle += 1
            if max_idle_polls is not None and idle >= max_idle_polls:
                return results
            time.sleep(poll_interval)


def status(lake_dir: str) -> dict:
    """Progress/lineage snapshot (the GetStatus/GetProcessedTickIntervals
    analog): high watermark, contiguous committed intervals, gaps,
    per-partition lineage."""
    man = Manifest(lake_dir)
    state = man.load_state()
    epochs = state.committed_epochs
    intervals: list[list[int]] = []
    for e in sorted(epochs):
        if intervals and e == intervals[-1][1] + 1:
            intervals[-1][1] = e
        else:
            intervals.append([e, e])
    parts = {p: man.read_checkpoint(p) for p in range(man.num_partitions)}
    # per-epoch throughput history from the manifest metrics — the
    # Prometheus-gauge analog (`transactions-producer/domain/metrics.go:19-50`)
    from ..state.manifest import read_json
    import os as _os

    recent = []
    for e in sorted(epochs)[-10:]:
        rec = read_json(
            _os.path.join(man.manifest_dir, f"epoch_{e:06d}.json")
        )
        m = rec.get("metrics", {})
        recent.append(
            {
                "epoch": e,
                "events": m.get("events"),
                "sec": m.get("sec"),
                "events_per_sec": m.get("events_per_sec"),
            }
        )
    return {
        "recent_epochs": recent,
        "last_committed_epoch": max(epochs, default=-1),
        "committed_at_lsn": max(
            (parts[p]["last_lsn"] for p in parts), default=0
        ),
        "epoch_intervals": [tuple(iv) for iv in intervals],
        "gaps": gap_scan(lake_dir)["gaps"],
        "schema_version": state.schema_version,
        "num_partitions": man.num_partitions,
        "partitions": parts,
        "total_rows": sum(parts[p]["row_count"] for p in parts),
        "total_bytes": sum(parts[p]["bytes"] for p in parts),
    }
