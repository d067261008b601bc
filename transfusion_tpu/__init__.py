"""transfusion-tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of algvr/transfusion (CVPR 2024 TransFusion, Ego4D short-term
object interaction anticipation).

This is a ground-up rebuild, not a port: the compute path is functional JAX
with static shapes throughout (masked fixed-size tensors replace the
reference's dynamic list-of-tensors detection pipeline), data-parallel over a
`jax.sharding.Mesh`, with Pallas kernels for the hot ops.

Reference behavior citations throughout the tree point into the upstream
repository layout (e.g. ``runner/run_experiment.py:68-162``) so parity can be
checked file by file.
"""

__version__ = "0.1.0"
