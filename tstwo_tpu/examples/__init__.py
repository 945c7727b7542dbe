"""Example AIRs: the canonical 3-column test AIR and wide Fibonacci."""
