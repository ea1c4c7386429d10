"""Streaming & incremental layer (SURVEY.md §2.9).

The reference is batch-only with a disciplined incremental pattern
(high-water marks, open-day exclusion, at-least-once inserts deduped on
read). Here that maps to:

- `incremental`: checkpointed high-water-mark bookkeeping for
  incremental batch (I1/I2).
- `jobs`: Structured Streaming equivalents - watermarked tumbling
  daily aggregation (I4), idempotent foreachBatch dedupe sink (I3),
  and an applyInPandasWithState running-balance operator (custom
  stateful op, I6).
"""
