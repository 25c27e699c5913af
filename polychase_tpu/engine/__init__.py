"""Pure-JAX computational engine for polychase_tpu."""
