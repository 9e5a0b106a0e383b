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

import os
import time

from ..state.manifest import Manifest
from .apply import apply_epoch, apply_log, discover_epochs
from .verify import gap_scan


def _grown_epochs(man: Manifest, events_dir: str, done: set[int]) -> list[int]:
    """Committed epochs whose source directory gained files/bytes since
    commit (late data appended to an already-applied epoch).  Compares
    the directory's current parquet count+bytes to the ``src_files`` /
    ``src_bytes`` recorded in the epoch's manifest metrics."""
    grown = []
    for e in sorted(done):
        edir = os.path.join(events_dir, f"epoch={e}")
        if not os.path.isdir(edir):
            continue
        files = [f for f in os.listdir(edir) if f.endswith(".parquet")]
        m = man.epoch_record(e).get("metrics", {})
        if "src_files" not in m:
            continue  # pre-metrics commit; nothing to compare against
        cur_bytes = sum(os.path.getsize(os.path.join(edir, f)) for f in files)
        if len(files) > m["src_files"] or cur_bytes > m["src_bytes"]:
            grown.append(e)
    return grown


def tail(
    events_dir: str,
    lake_dir: str,
    *,
    poll_interval: float = 1.0,
    max_idle_polls: int | None = 3,
    salt: int = 0,
    publish_to: str | None = None,
    publish_value_cols: tuple[str, ...] = (),
    slice_bytes: int | None = None,
) -> list[dict]:
    """Apply new epochs as they appear, and force-reapply committed
    epochs whose directories grew (late files); at-least-once +
    idempotent commits = effectively-once, exactly like the consumer
    loop (`transactions-consumer/consume/transaction_consumer.go:72-91`).

    A grown epoch that was already folded into a compacted base cannot
    be force-reapplied (the delta would be invisible — see
    ``apply_epoch``); the refusal is recorded in the results instead of
    crashing the tail loop, so the operator can re-submit the late rows
    as a new epoch.

    ``publish_to`` turns the tail into a full CDC RELAY: after each
    round of newly applied epochs, the per-epoch changefeed is
    published to that directory (``pipelines/publish.py``) — the
    upstream-log-consumer and downstream-feed-producer halves of the
    reference running as one loop."""
    results: list[dict] = []
    idle = 0
    # Epochs whose force-reapply was refused (already compacted).  Their
    # source-dir metrics never update, so _grown_epochs would re-report
    # them EVERY poll — without this set the loop hot-spins at 100% CPU,
    # appends a refusal record per poll, and never reaches max_idle_polls.
    refused: set[int] = set()
    while True:
        man = Manifest(lake_dir)
        done = set(man.committed_epochs())
        horizon = man.compaction_horizon()
        # epochs at/below the horizon are folded (e.g. a repartitioned
        # lake): they never gain an epoch record, so without this filter
        # they'd read as pending every poll — a 100% CPU hot spin with
        # an unbounded results list (same class as the `refused` set)
        pending = [
            e for e in discover_epochs(events_dir) if e not in done and e > horizon
        ]
        grown = [e for e in _grown_epochs(man, events_dir, done) if e not in refused]
        progressed = False
        regrown_ok: list[int] = []
        for e in grown:
            try:
                r = apply_epoch(
                    events_dir, lake_dir, e, salt=salt, force=True,
                    slice_bytes=slice_bytes,
                )
                r["regrown"] = True
                results.append(r)
                regrown_ok.append(e)
                progressed = True
            except ValueError as exc:
                refused.add(e)  # record ONCE; counts as idle thereafter
                results.append({"epoch": e, "regrown": True, "refused": str(exc)})
        if pending:
            rs = apply_log(events_dir, lake_dir, salt=salt, slice_bytes=slice_bytes)
            applied_now = [r for r in rs if not r.get("skipped")]
            results.extend(applied_now)
            if applied_now:
                progressed = True
        if publish_to is not None:
            # continuous CDC relay: every newly committed epoch is
            # immediately re-published as a downstream feed — consume
            # upstream log -> lake -> publish, the reference's
            # producer+consumer pair in one loop (idempotent on both
            # sides, so a crash anywhere re-converges).  Called every
            # poll, not only on progress: a crash between apply and
            # publish otherwise leaves committed epochs beyond the feed
            # cursor unpublished until the next upstream epoch arrives.
            from .publish import invalidate_feeds_from, publish_changefeed

            for e in regrown_ok:
                # a force-reapplied epoch changes the as-of state at e
                # and BEYOND: already-published feeds from e are stale
                # and would silently drop the late rows downstream —
                # invalidate so this round republishes fresh diffs
                inv = invalidate_feeds_from(publish_to, e)
                if inv["invalidated"] or inv.get("resync_required"):
                    results.append({"feed_invalidated_from": e, **inv})
            pub = publish_changefeed(
                lake_dir, publish_to, value_cols=publish_value_cols
            )
            if pub["published"]:
                results.append({"published": pub["published"]})
                progressed = True
        if progressed:
            idle = 0
        else:
            idle += 1
            if max_idle_polls is not None and idle >= max_idle_polls:
                return results
            time.sleep(poll_interval)


def serve_status(lake_dir: str, port: int = 0):
    """Serve ``status()`` over HTTP — the reference's status-service
    surface (gRPC+HTTP, `status-service/main.go:235-242`) as a
    zero-dependency stdlib endpoint.  Returns the live server (already
    started in a daemon thread) with ``.server_port`` for tests /
    callers; ``GET /status`` -> JSON, ``GET /health`` -> ok."""
    import http.server
    import json as _json
    import threading

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib API name)
            if self.path == "/health":
                body = b"ok"
                ctype = "text/plain"
            elif self.path == "/status":
                body = _json.dumps(status(lake_dir), default=str).encode()
                ctype = "application/json"
            elif self.path == "/metrics":
                body = metrics_text(lake_dir).encode()
                ctype = "text/plain; version=0.0.4"
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", port), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def metrics_text(lake_dir: str) -> str:
    """``status()`` re-expressed as Prometheus text exposition — the
    scrape surface the reference exposes on every service
    (`transactions-producer/domain/metrics.go:19-50` gauges like last
    processed tick / fetched / published counts).  Gauge names mirror
    the status fields; per-partition lineage rides a ``partition``
    label."""
    st = status(lake_dir)
    last = st["recent_epochs"][-1] if st["recent_epochs"] else {}
    lines: list[str] = []
    declared: set[str] = set()

    def gauge(name: str, value, help_: str, labels: str = "") -> None:
        if value is None:
            return
        if name not in declared:
            declared.add(name)
            lines.append(f"# HELP {name} {help_}")
            lines.append(f"# TYPE {name} gauge")
        lines.append(f"{name}{labels} {value}")

    gauge("gdp_last_committed_epoch", st["last_committed_epoch"],
          "highest committed epoch (the tick watermark analog)")
    gauge("gdp_committed_at_lsn", st["committed_at_lsn"],
          "high LSN watermark across partitions")
    gauge("gdp_epoch_gaps", len(st["gaps"]), "missing epochs between first and last commit")
    gauge("gdp_schema_version", st["schema_version"], "cumulative schema evolution count")
    gauge("gdp_num_partitions", st["num_partitions"], "lake partition count")
    gauge("gdp_total_rows", st["total_rows"], "rows across live base+delta files")
    gauge("gdp_total_bytes", st["total_bytes"], "bytes across live base+delta files")
    gauge("gdp_last_epoch_events", last.get("events"),
          "change events in the most recent committed epoch")
    gauge("gdp_last_epoch_events_per_sec", last.get("events_per_sec"),
          "apply throughput of the most recent committed epoch")
    for p, cp in sorted(st["partitions"].items()):
        lbl = f'{{partition="{p}"}}'
        gauge("gdp_partition_last_lsn", cp["last_lsn"],
              "per-partition lineage: last applied LSN", lbl)
        gauge("gdp_partition_rows", cp["row_count"],
              "per-partition lineage: live row count", lbl)
        gauge("gdp_partition_bytes", cp["bytes"],
              "per-partition lineage: live bytes", lbl)
    return "\n".join(lines) + "\n"


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
