"""Custom physical strategies: plans Catalyst doesn't produce on its own."""
