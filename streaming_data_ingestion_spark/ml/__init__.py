"""Distributed training utilities backing the ANN/IVF query surface."""
