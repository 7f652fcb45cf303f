"""Low-level neural-net ops and Pallas kernels."""
