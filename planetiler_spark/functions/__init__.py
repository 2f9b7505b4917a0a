"""Column-level functions: shared SQL fragments + pandas UDFs."""
