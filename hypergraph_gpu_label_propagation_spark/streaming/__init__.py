"""Structured Streaming surface.

The reference engine is strictly batch-iterative (SURVEY.md section 2.5:
no watermarks/windows/state anywhere), so streaming is additive here:
incremental ingestion paths that keep the engine's tables fresh.
"""
