"""Input readers and deterministic test-corpus synthesis."""
