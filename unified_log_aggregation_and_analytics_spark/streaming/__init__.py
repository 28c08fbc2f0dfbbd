"""Streaming layer: triggers, DLQ split, partitioned sink (ST1-ST8, K1-K5)."""
