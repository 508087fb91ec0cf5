"""Structured Streaming forms of the engine's operators.

Every batch operator in gmall_flink_yb_spark.operators is a pure
DataFrame -> DataFrame function and runs unchanged under readStream where
Spark supports it (filters, projections, explode, broadcast config join,
stream-static dim joins, watermarked stream-stream interval join,
watermark + dropDuplicates dedup). This package adds the pieces that are
streaming-specific:

- stateful.py  : keyed per-device state the DataFrame API cannot express —
                 new-visitor correction (ST1) and CEP-style bounce detection
                 with event-time timeout (ST3) via applyInPandasWithState.
- pipelines.py : end-to-end streaming wiring — file/Kafka sources, the
                 3-way log split fan-out (P1) as a single-read foreachBatch,
                 CDC routing with per-micro-batch config refresh (P2/ST4),
                 dim-table upserts (K3), per-row-topic Kafka payloads (K2),
                 and the order-wide interval join (J1) with watermarks.
"""
