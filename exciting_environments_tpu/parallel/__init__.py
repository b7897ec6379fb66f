"""Multi-chip parallelism: device meshes, batch sharding, collectives."""
