"""SPMD distribution: mesh construction, sharding placement helpers,
and the explicit halo-exchange stencil path."""
