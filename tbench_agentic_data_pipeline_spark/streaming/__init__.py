"""Structured Streaming surface (SURVEY.md §2.10 + §7 Phase 5).

The reference's "stream" is an agent polling loop over a work queue; the
target engine needs a real streaming surface. Batch mirrors of every
window kind are registered as oracle-checkable queries (windows.py); the
streaming builders themselves (readStream → watermark → window/state →
writeStream) are exercised by tests with in-memory sources.
"""
