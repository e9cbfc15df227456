"""Multi-device sharding (data-parallel batches, spatial tiling)."""
