"""Compute kernels: jnp reference forms + Pallas TPU kernels.

Every Pallas kernel keeps a jnp twin as fallback and test oracle
(SURVEY.md section 7, Stage 3).
"""
