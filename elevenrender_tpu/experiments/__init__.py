"""Measured-out experimental kernels — correct, tested, NOT in the
supported trace-mode matrix.

Each module documents the measurement that demoted it (docs/PERF.md);
kept because the engineering (packing layouts, traversal variants) is
reusable and the parity tests keep them honest against bit-rot.
"""
