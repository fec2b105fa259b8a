"""TPU kernel ops (Pallas)."""
