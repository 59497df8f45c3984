"""Host-side utilities: file IO (PLY/GLB/COLMAP/images), logging, profiling."""
