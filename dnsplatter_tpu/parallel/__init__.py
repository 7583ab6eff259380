"""Multi-chip scaling: device meshes, sharded train steps, collectives."""
