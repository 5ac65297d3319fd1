"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.10): its closest streaming
concept is idempotent re-run + table-existence checkpointing.  The
engine is likewise batch-first; this package provides the incremental
*ingest* path — new image files appearing in a directory are signed
(fingerprint + MinHash + pHash) continuously, so the expensive UDF work
is amortized before the next batch dedup run picks the signatures up.
"""
