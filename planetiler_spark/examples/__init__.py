"""Runnable programmatic-API examples — the planetiler-examples module
analog (Main.java registers them as example-* tasks)."""
