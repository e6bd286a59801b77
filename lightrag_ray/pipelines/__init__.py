"""End-to-end pipeline drivers."""
