"""Device scan kernels and the host-side scan runtime."""
