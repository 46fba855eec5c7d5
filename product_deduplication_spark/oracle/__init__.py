"""Test oracles: brute-force pandas implementations used only in pytest.

These play the role the reference pipeline plays in SURVEY.md §5.2 — an
independent, exhaustively-correct implementation at small scale that the
distributed pipeline must match (dup-pair recall >= 0.99 at the same
shingle/signature config, BASELINE.json metric).
"""
