"""Vectorized (numpy / Arrow) scalar kernels used inside pandas UDFs.

Policy per BASELINE.json input_hint: NO per-row Python UDFs anywhere in the
engine — every Python-side computation is an Arrow-batched pandas UDF whose
inner loop is numpy over the whole batch (SURVEY.md §2.10, §4.3).
"""
