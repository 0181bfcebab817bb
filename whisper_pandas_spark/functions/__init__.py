"""Column-expression helpers shared across operators."""
