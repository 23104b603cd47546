"""Batched TPU feature kernels (JAX/XLA/Pallas)."""
