"""Pallas TPU kernels for the framework's hot paths.

These back the ``impl='pallas'`` switch (SURVEY.md §7 ops Phase B).
Each kernel has an XLA fallback with identical semantics; parity is
enforced by tests (interpret mode on CPU, compiled on TPU).
"""
