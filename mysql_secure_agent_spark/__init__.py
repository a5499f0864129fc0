"""mysql_secure_agent_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch rebuild of the capabilities of fivetran/mysql-secure-agent
(reference at /root/reference, Java): binlog-shaped change-feed tailing,
keyed upsert/delete application, schema evolution, exactly-once resume —
re-expressed Spark-first over a bucketed copy-on-write lake table of
multi-turn conversation transcripts keyed on (conv_id, turn_idx).

Layout:
  lake/       — TranscriptTable: bucketed CoW Parquet table + atomic commit log
                (the MERGE INTO target; stands in for Iceberg, which is not
                available in this sandbox)
  sources/    — deterministic binlog-shaped changelog generator + binary
                row-image codec (Arrow-vectorized decode)
  operators/  — changelog dedup (last-image-wins), update decomposition,
                keyset pagination, anonymization, dedup suite (exact /
                minhash-LSH / simhash / n-gram jaccard / embedding near-dup),
                ANN top-k, skew salting
  functions/  — scalar function surface (hashing, text analysis, similarity)
  streaming/  — Structured Streaming pipeline (foreachBatch merge, checkpoint
                resume, lineage metrics)
  oracle.py   — sequential pandas replay oracle (the reference's single-
                threaded Updater semantics as executable ground truth)
"""

__version__ = "0.1.0"
