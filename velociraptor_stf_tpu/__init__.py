"""velociraptor_stf_tpu: TPU-native halo/subhalo finder.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
VELOCIraptor-STF (reference surveyed in SURVEY.md): friends-of-friends halo
finding (3D + 6D phase space), phase-space substructure search, gravitational
unbinding, bulk property calculation, and catalog output -- designed for TPU
meshes (SPMD sharding over ICI) rather than MPI+OpenMP clusters.
"""

__version__ = "0.1.0"
