"""Independent numerical-parity oracles.

Each module is a LITERAL transcription of one reference Fortran routine
(/root/reference/src/...) into slow scalar/loop-based numpy — deliberately
NOT vectorized and sharing no code with icar_tpu — so the fast JAX schemes
can be validated against an independent implementation of the same
numerics (VERDICT round-1 item #1).
"""
