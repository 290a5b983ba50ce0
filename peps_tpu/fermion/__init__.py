"""Z2-graded (fermionic) tensor backend.

Replaces the reference's qlten graded-tensor layer (fermionic QLTensor used
throughout `square_lattice_peps_projection_impl.h:61-122`) with a TPU-first
design: dense arrays + STATIC parity metadata; Koszul signs become constant
elementwise masks that XLA fuses into the surrounding einsums.
"""
