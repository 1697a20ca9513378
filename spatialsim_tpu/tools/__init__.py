"""Offline tools: record / playback / export CLIs (reference L5 layer)."""
