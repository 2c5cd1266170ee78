"""eagle_mpc_tpu: a TPU-native MPC & trajectory-optimization framework.

A from-scratch JAX/XLA re-design of the capabilities of PepMS/eagle-mpc
(multicopter + manipulator optimal control: SbFDDP trajectory generation and
Carrot/Rail/Weighted nonlinear MPC), built for TPU: problems are (static
structure, dynamic parameter pytrees), solvers are lax.scan/while_loop
programs, and scenario batches are vmapped and mesh-sharded.
"""

__version__ = "0.1.0"
