"""Query plans: the engine's query surface + end-to-end pipeline driver."""
