"""Multimodal (binary) column handling — see ``binary_ops``."""
