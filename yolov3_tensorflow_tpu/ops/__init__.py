"""Numeric ops: box geometry, NMS (XLA + Pallas), losses, postprocess."""
