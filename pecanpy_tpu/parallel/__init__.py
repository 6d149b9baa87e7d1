"""Multi-device scaling: meshes, sharded walkers, data-parallel SGNS."""
