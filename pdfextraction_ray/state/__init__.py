"""Checkpoint manifests and resumable-run state."""
