"""Device meshes and sharded pipeline steps."""
