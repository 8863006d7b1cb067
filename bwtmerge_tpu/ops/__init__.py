"""Compute ops: rank/LF, wavefront search, interleave.

Each op has a numpy backend (reference semantics, CPU) and a JAX/Pallas backend
(the TPU path). The numpy backend doubles as the oracle for the device kernels.
"""
