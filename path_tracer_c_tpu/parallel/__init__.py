"""Sharding layer: device meshes, tile/spp-sharded rendering, collectives."""
