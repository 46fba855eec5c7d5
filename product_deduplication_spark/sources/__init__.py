"""Sources & sinks: typed readers for the engine's tables."""
