"""Query plans: the engine's public query surface (SURVEY.md §2 inventory),
each paired with an ANSI-SQL oracle for the driver's DuckDB comparison."""
