"""CLI / `ray job submit` entrypoint — the analog of the reference's
per-service binaries (`transactions-producer`, `*-consumer`,
`status-service`, ...; `app/transactions-producer/main.go:36-201`),
collapsed into one driver with subcommands:

    python -m go_data_publisher_ray.cli generate  --out DIR [--events N ...]
    python -m go_data_publisher_ray.cli bootstrap --base DIR --lake DIR --partitions P
    python -m go_data_publisher_ray.cli apply     --events DIR --lake DIR [--salt S] [--epoch E] [--force]
    python -m go_data_publisher_ray.cli tail      --events DIR --lake DIR [--poll 1.0] [--max-idle 3]
    python -m go_data_publisher_ray.cli compact   --lake DIR [--min-deltas K] [--delta-ratio R]
    python -m go_data_publisher_ray.cli snapshot  --lake DIR --out DIR [--columns a,b]
    python -m go_data_publisher_ray.cli status    --lake DIR
    python -m go_data_publisher_ray.cli verify    --lake DIR [--base DIR --events DIR]

Owns the Ray session (init/shutdown) — the only layer that does, per
the driver contract.  On a real cluster, submit with
`ray job submit -- python -m go_data_publisher_ray.cli apply ...`.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def _init_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = dict(
            address="local", include_dashboard=False, logging_level="ERROR"
        )
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False



def _typed_keys(lake_dir: str, raw: str) -> list:
    """Parse a comma-separated key list, cast to the lake's key-column
    type (integer-keyed entities hash int(5), not '5' — a string key
    would probe the wrong partition)."""
    import pyarrow as pa

    from .state.manifest import Manifest

    man = Manifest(lake_dir)
    kcol = man.merge_spec.key_cols[0]
    schema = man.load_state().schema
    parts = raw.split(",")
    ktype = schema.field(kcol).type if schema is not None else pa.string()
    return [int(k) for k in parts] if pa.types.is_integer(ktype) else parts


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="go_data_publisher_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="write a deterministic synthetic CDC fixture")
    g.add_argument("--out", required=True)
    g.add_argument("--events", type=int, default=50_000)
    g.add_argument("--base-rows", type=int, default=10_000)
    g.add_argument("--epoch-size", type=int, default=5_000)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--evolve-epoch", type=int, default=None)
    g.add_argument("--format", choices=["parquet", "jsonl"], default="parquet")

    b = sub.add_parser("bootstrap", help="load the base table into a new lake")
    b.add_argument("--base", required=True)
    b.add_argument("--lake", required=True)
    b.add_argument("--partitions", type=int, default=32)
    b.add_argument(
        "--entity",
        choices=["pages", "intervals", "content"],
        default="pages",
        help="merge semantics for the lake (schema.MergeSpec); fixed at creation",
    )
    b.add_argument(
        "--shard",
        default=None,
        metavar="K/N",
        help="ingest only partitions with part %% N == K (horizontal "
        "service sharding; also settable via GDP_SHARD)",
    )
    b.add_argument(
        "--key-normalizer",
        choices=["url_canonical"],
        default=None,
        help="canonicalize the partition key at ingest (pages entity: "
        "url spelling variants merge to one row); fixed at creation "
        "like --entity",
    )
    b.add_argument(
        "--suppress-unchanged",
        action="store_true",
        help="no-op update suppression: an upsert whose value columns "
        "equal the key's current winner writes no delta row, no "
        "changefeed diff, no replica traffic (web CDC: unchanged "
        "re-crawls are the common case); fixed at creation",
    )

    a = sub.add_parser("apply", help="apply pending epochs (or one epoch)")
    a.add_argument("--events", required=True)
    a.add_argument("--lake", required=True)
    a.add_argument("--salt", type=int, default=0)
    a.add_argument("--epoch", type=int, default=None)
    a.add_argument("--force", action="store_true")
    a.add_argument("--format", choices=["parquet", "jsonl"], default="parquet")
    a.add_argument("--shard", default=None, metavar="K/N",
                   help="apply only this key shard (see bootstrap --shard)")
    a.add_argument(
        "--retries",
        type=int,
        default=0,
        help="retry a failed epoch up to N times, halving task "
        "parallelism each time (adaptive shrink on consecutive errors)",
    )
    a.add_argument(
        "--slice-bytes",
        type=int,
        default=None,
        help="sub-epoch backlog bound: apply oversized epochs in "
        "file-granular slices of at most this many source bytes "
        "(GDP_SLICE_BYTES env equivalent)",
    )
    a.add_argument(
        "--patch",
        default=None,
        help=(
            "JSON list of data-quality patch rules (M6), e.g. "
            '\'[{"range_col":"lsn","lo":100,"hi":200,"set_col":"lang",'
            '"set_value":"und"}]\''
        ),
    )

    t = sub.add_parser("tail", help="poll for new epochs and apply them")
    t.add_argument("--events", required=True)
    t.add_argument("--lake", required=True)
    t.add_argument("--poll", type=float, default=1.0)
    t.add_argument("--max-idle", type=int, default=3)
    t.add_argument(
        "--publish-to",
        default=None,
        help="relay mode: publish each applied epoch's changefeed here",
    )
    t.add_argument("--publish-value-cols", default=None)
    t.add_argument(
        "--slice-bytes",
        type=int,
        default=None,
        help="sub-epoch backlog bound for applied epochs (see apply)",
    )

    c = sub.add_parser("compact", help="fold deltas into new base files")
    c.add_argument("--lake", required=True)
    c.add_argument("--min-deltas", type=int, default=1)
    c.add_argument(
        "--delta-ratio",
        type=float,
        default=None,
        help="size-tiered trigger: fold when delta bytes >= RATIO x base "
        "bytes (min-deltas becomes the file-count backstop)",
    )

    vc = sub.add_parser("vacuum", help="delete data files the live view can't reach")
    vc.add_argument("--lake", required=True)
    vc.add_argument(
        "--orphans",
        action="store_true",
        help="also sweep unreferenced files (NOT concurrent-apply safe)",
    )

    rp = sub.add_parser(
        "repartition", help="rewrite the lake into a new partition count"
    )
    rp.add_argument("--lake", required=True, help="source lake")
    rp.add_argument("--out", required=True, help="destination lake (must not exist)")
    rp.add_argument("--partitions", type=int, required=True)

    ss = sub.add_parser(
        "split-shard",
        help="grow the fleet: split shard k/n into k/2n and (k+n)/2n (metadata-only)",
    )
    ss.add_argument("--lake", required=True, help="source shard lake")
    ss.add_argument("--out-a", required=True, help="child lake k/2n (must not exist)")
    ss.add_argument("--out-b", required=True, help="child lake (k+n)/2n (must not exist)")
    ss.add_argument(
        "--copy", action="store_true", help="copy data files instead of hardlinking"
    )

    s = sub.add_parser("snapshot", help="export the merged state as parquet")
    s.add_argument("--lake", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--columns", default=None)
    s.add_argument(
        "--upto-epoch",
        type=int,
        default=None,
        help="time-travel: export the state as of this committed epoch",
    )
    s.add_argument(
        "--format",
        choices=["parquet", "csv", "jsonl"],
        default="parquet",
        help="export sink encoding (binary columns hex-encode in csv/jsonl)",
    )

    er = sub.add_parser(
        "erase", help="physically remove keys from state AND history (GDPR)"
    )
    er.add_argument("--lake", required=True)
    er.add_argument("--keys", required=True, help="comma-separated key values")
    er.add_argument(
        "--feed-dirs",
        default=None,
        help="comma-separated published feed dirs to erase the keys' "
        "payload from too (publishes the tombstone epoch first)",
    )

    rt = sub.add_parser(
        "retire-feed",
        help="feed retention: drop published epochs at/below a floor and "
        "advance the feed's bootstrap point (Kafka retention analog)",
    )
    rt.add_argument("--lake", required=True)
    rt.add_argument("--feed", required=True)
    rt.add_argument("--upto-epoch", type=int, required=True)

    lk = sub.add_parser("lookup", help="point lookup by primary key (no scan)")
    lk.add_argument("--lake", required=True)
    lk.add_argument("--keys", required=True, help="comma-separated key values")
    lk.add_argument("--upto-epoch", type=int, default=None)

    df = sub.add_parser(
        "diff", help="changefeed between two committed epochs (added/changed/deleted)"
    )
    df.add_argument("--lake", required=True)
    df.add_argument("--from-epoch", type=int, required=True)
    df.add_argument("--to-epoch", type=int, required=True)
    df.add_argument("--out", default=None, help="also write the change rows as parquet")

    pb = sub.add_parser(
        "publish", help="emit per-epoch changefeed parquet beyond the publish cursor"
    )
    pb.add_argument("--lake", required=True)
    pb.add_argument("--out", required=True)
    pb.add_argument(
        "--value-cols",
        default=None,
        help="comma-separated payload columns to carry as old_*/new_*",
    )

    rc = sub.add_parser(
        "replicate", help="build/catch-up a replica lake from a published feed"
    )
    rc.add_argument("--feed", required=True)
    rc.add_argument("--lake", required=True, help="replica lake dir")
    rc.add_argument("--bootstrap", required=True,
                    help="parquet export of the source snapshot as of the feed's bootstrap epoch")
    rc.add_argument("--partitions", type=int, default=8)
    rc.add_argument(
        "--shard",
        default=None,
        metavar="K/N",
        help="consume only this key shard: N replicate drivers over the "
        "same feed form a downstream consumer fleet",
    )

    st = sub.add_parser("status", help="print progress/lineage JSON")
    st.add_argument("--lake", required=True)
    st.add_argument(
        "--serve",
        type=int,
        default=None,
        metavar="PORT",
        help="serve GET /status + /health over HTTP instead of printing once",
    )

    v = sub.add_parser("verify", help="gap scan + lineage check (+ replay oracle)")
    v.add_argument("--lake", required=True)
    v.add_argument("--base", default=None)
    v.add_argument("--events", default=None)
    v.add_argument(
        "--distributed",
        action="store_true",
        help="per-partition replay audit as a Ray job (deadletters mismatches)",
    )

    args = p.parse_args(argv)

    if args.cmd == "generate":
        from .sources.generator import LogSpec, write_log, write_log_ray

        spec = LogSpec(
            seed=args.seed,
            n_base=args.base_rows,
            n_events=args.events,
            epoch_size=args.epoch_size,
            evolve_epoch=args.evolve_epoch,
        )
        if args.events >= 1_000_000:
            _init_ray(args.num_cpus)
            out = write_log_ray(spec, args.out)
        else:
            out = write_log(spec, args.out)
        if args.format == "jsonl":
            from .sources.jsonl import parquet_events_to_jsonl

            out["events_dir"] = parquet_events_to_jsonl(out["events_dir"])
        print(json.dumps(out))
        return 0

    _init_ray(args.num_cpus)
    import ray

    try:
        if args.cmd == "bootstrap":
            from .pipelines.apply import bootstrap
            from .schema import CONTENT_SPEC, INTERVALS_SPEC

            spec = {"intervals": INTERVALS_SPEC, "content": CONTENT_SPEC}.get(
                args.entity
            )
            if args.key_normalizer or args.suppress_unchanged:
                from .schema import PAGES_SPEC

                if args.key_normalizer and args.entity != "pages":
                    # intervals keys on int64 epoch_id (kernel would
                    # crash), content keys on a hash (nonsensical); the
                    # spec is persisted at creation so a bad combination
                    # would wedge every later apply — refuse up front
                    raise SystemExit(
                        f"--key-normalizer applies to the pages entity "
                        f"only (got --entity {args.entity})"
                    )
                # MergeSpec.__post_init__ validates --suppress-unchanged
                spec = dataclasses.replace(
                    spec or PAGES_SPEC,
                    key_normalizer=args.key_normalizer,
                    suppress_unchanged=args.suppress_unchanged,
                )
            from .pipelines.apply import parse_shard

            shard = parse_shard(args.shard) if args.shard else None
            print(
                json.dumps(
                    bootstrap(
                        args.base,
                        args.lake,
                        args.partitions,
                        merge_spec=spec,
                        shard=shard,
                    )
                )
            )
        elif args.cmd == "apply":
            events_dir = args.events
            if args.format == "jsonl":
                from .sources.jsonl import jsonl_events_to_parquet

                events_dir = jsonl_events_to_parquet(events_dir)
            from .pipelines.apply import apply_epoch, apply_log

            patch_rules = ()
            if args.patch:
                from .stages.patch import PatchRule

                patch_rules = tuple(
                    PatchRule(**r) for r in json.loads(args.patch)
                )
            from .pipelines.apply import parse_shard

            shard = parse_shard(args.shard) if args.shard else None
            if args.epoch is not None:
                from .pipelines.apply import apply_epoch_adaptive

                out = [
                    apply_epoch_adaptive(
                        events_dir,
                        args.lake,
                        args.epoch,
                        retries=args.retries,
                        salt=args.salt,
                        force=args.force,
                        patch_rules=patch_rules,
                        shard=shard,
                        slice_bytes=args.slice_bytes,
                    )
                ]
            else:
                out = apply_log(
                    events_dir,
                    args.lake,
                    salt=args.salt,
                    patch_rules=patch_rules,
                    shard=shard,
                    retries=args.retries,
                    slice_bytes=args.slice_bytes,
                )
            print(json.dumps(out))
        elif args.cmd == "tail":
            from .pipelines.tail import tail

            vcols = (
                tuple(args.publish_value_cols.split(","))
                if args.publish_value_cols
                else ()
            )
            out = tail(
                args.events,
                args.lake,
                poll_interval=args.poll,
                max_idle_polls=args.max_idle,
                publish_to=args.publish_to,
                publish_value_cols=vcols,
                slice_bytes=args.slice_bytes,
            )
            print(json.dumps(out))
        elif args.cmd == "compact":
            from .pipelines.compact import compact

            print(
                json.dumps(
                    compact(
                        args.lake,
                        min_deltas=args.min_deltas,
                        delta_ratio=args.delta_ratio,
                    )
                )
            )
        elif args.cmd == "vacuum":
            from .pipelines.maintain import vacuum

            print(json.dumps(vacuum(args.lake, include_orphans=args.orphans)))
        elif args.cmd == "repartition":
            from .pipelines.maintain import repartition_lake

            print(json.dumps(repartition_lake(args.lake, args.out, args.partitions)))
        elif args.cmd == "split-shard":
            from .pipelines.shard import split_shard

            print(
                json.dumps(
                    split_shard(args.lake, args.out_a, args.out_b, link=not args.copy)
                )
            )
        elif args.cmd == "snapshot":
            from .pipelines.snapshot import export_snapshot

            cols = args.columns.split(",") if args.columns else None
            print(
                json.dumps(
                    export_snapshot(
                        args.lake,
                        args.out,
                        columns=cols,
                        upto_epoch=args.upto_epoch,
                        fmt=args.format,
                    )
                )
            )
        elif args.cmd == "erase":
            from .pipelines.maintain import erase_keys

            fds = tuple(args.feed_dirs.split(",")) if args.feed_dirs else ()
            print(
                json.dumps(
                    erase_keys(
                        args.lake, _typed_keys(args.lake, args.keys), feed_dirs=fds
                    )
                )
            )
        elif args.cmd == "retire-feed":
            from .pipelines.publish import retire_feed_epochs

            print(json.dumps(retire_feed_epochs(args.lake, args.feed, args.upto_epoch)))
        elif args.cmd == "lookup":
            from .pipelines.snapshot import lookup_keys

            t = lookup_keys(
                args.lake, _typed_keys(args.lake, args.keys), upto_epoch=args.upto_epoch
            )
            rows = t.to_pylist()
            for r in rows:
                for c, v in r.items():
                    if isinstance(v, bytes):
                        r[c] = v.hex()
            print(json.dumps(rows, default=str))
        elif args.cmd == "diff":
            from .pipelines.snapshot import snapshot_diff

            ds = snapshot_diff(args.lake, args.from_epoch, args.to_epoch)
            if args.out:
                ds.write_parquet(args.out)
                ds = __import__("ray").data.read_parquet(args.out)
            counts = {
                r["change"]: r["count()"]
                for r in ds.groupby("change").count().take_all()
            }
            print(
                json.dumps(
                    {
                        "from_epoch": args.from_epoch,
                        "to_epoch": args.to_epoch,
                        "changes": counts,
                        "out": args.out,
                    }
                )
            )
        elif args.cmd == "publish":
            from .pipelines.publish import publish_changefeed

            vcols = tuple(args.value_cols.split(",")) if args.value_cols else ()
            print(json.dumps(publish_changefeed(args.lake, args.out, value_cols=vcols)))
        elif args.cmd == "replicate":
            from .pipelines.apply import parse_shard
            from .pipelines.publish import replicate

            print(
                json.dumps(
                    replicate(
                        args.feed,
                        args.lake,
                        bootstrap_dir=args.bootstrap,
                        num_partitions=args.partitions,
                        shard=parse_shard(args.shard) if args.shard else None,
                    )
                )
            )
        elif args.cmd == "status":
            from .pipelines.tail import serve_status, status

            if args.serve is not None:
                srv = serve_status(args.lake, args.serve)
                print(json.dumps({"serving": f"http://127.0.0.1:{srv.server_port}/status"}))
                import threading

                threading.Event().wait()  # serve until killed
            else:
                print(json.dumps(status(args.lake)))
        elif args.cmd == "verify":
            from .pipelines.verify import gap_scan, lineage_check

            out = {"gaps": gap_scan(args.lake), "lineage": lineage_check(args.lake)}
            if args.base and args.events:
                if args.distributed:
                    from .pipelines.verify import verify_partitions

                    out["replay_audit"] = verify_partitions(
                        args.lake, args.base, args.events
                    )
                else:
                    from .pipelines.snapshot import snapshot_table
                    from .pipelines.verify import replay_oracle_table, tables_equal
                    from .state.manifest import Manifest

                    man = Manifest(args.lake)
                    spec = man.merge_spec
                    ok, msg = tables_equal(
                        snapshot_table(args.lake),
                        replay_oracle_table(
                            args.base,
                            args.events,
                            spec=spec,
                            # sharded lake: oracle replays only its key shard
                            shard=man.shard,
                            num_partitions=man.num_partitions,
                        ),
                        sort_key=spec.partition_col,
                    )
                    out["replay_equivalent"] = ok
                    out["replay_detail"] = msg
            print(json.dumps(out, default=str))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
