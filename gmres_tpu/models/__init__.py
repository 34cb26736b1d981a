"""Model problems (operators + dense assemblies) used by tests and
benchmarks: 2-D Poisson, Hilbert, 2-D convection-diffusion."""
