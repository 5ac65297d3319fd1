"""Sources & sinks: schema-checked readers/writers for the engine's tables."""
