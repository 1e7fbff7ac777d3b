"""Multi-chip / multi-host scan: meshes, sharding, halo, collectives."""
