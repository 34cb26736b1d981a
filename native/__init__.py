"""Native C++/OpenMP baseline library (compiled on demand)."""
