"""Shared utilities: test-fixture generators, diagnostics, configuration."""
