"""CLI entry points (layer T7): train, rollout, parity."""
