"""Streaming: near-real-time index maintenance (the reference's NRT
reopen thread, re-expressed as Structured Streaming)."""
