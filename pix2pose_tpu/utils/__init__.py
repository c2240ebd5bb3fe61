"""Utilities: checkpointing, profiling, HDF5 weight import."""
