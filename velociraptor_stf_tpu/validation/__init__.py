"""Float64 oracle implementations of contested numerics, for validating
the f32 JAX pipeline against the reference algorithms (SURVEY.md §7.3)."""
