"""go_data_publisher_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-expression of the *capabilities* of
``qubic/go-data-publisher`` (binlog/WAL tail -> idempotent keyed upsert
into a lake, checkpointed resume, duplicate tolerance, replay
verification; see SURVEY.md) as idiomatic Ray Data:

- the change log is a Parquet table of insert/update/delete events over
  Common-Crawl-style web pages (``url, warc_ts, html, text, lang``),
  sliced into epochs (the reference's tick-interval analog,
  ``transactions-producer/entities/tx.go:17-25``);
- apply = ``read_parquet(epoch slice)`` -> ``map_batches`` normalize +
  url-hash partition + in-batch LWW pre-combine -> ``groupby(part)``
  -> per-partition sorted delta Parquet (the LSM memtable flush);
- the lake is base+delta files per partition, compacted periodically;
  commits are epoch-fenced and idempotent via an atomic manifest log
  (the analog of ES ``_id`` upsert + post-sink offset commit,
  ``transactions-consumer/extern/elastic_client.go:30-81``);
- per-partition checkpoints carry lineage ``{last_lsn, rows, bytes}``
  (the pebble watermark analog,
  ``transactions-producer/infrastructure/store/pebbledb/store.go:28-41``).

No module in this package calls ``ray.init``; the caller owns the Ray
session.
"""

__version__ = "0.1.0"
