"""Superseded LSTM kernel experiments, kept off the production import
path. Each was a measured step in the kernel campaign recorded in
docs/PERF.md; `lstm_enc5` (live, ops/pallas/lstm_enc5.py) combines the
winning ideas. These modules import shared infrastructure from the live
kernels and remain runnable (tests/test_pallas_archive.py), but nothing
in the package imports them.
"""
