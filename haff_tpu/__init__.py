"""haff_tpu — TPU-native bimanual affordance framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of
pearl-robot-lab/2HandedAfforder (LISA-style VLM + dual SAM mask decoders +
2HANDS data pipeline + ActAffordance benchmark), designed TPU-first:
SPMD over jax.sharding meshes, one jitted train/infer step, Pallas flash
attention, static shapes throughout.
"""

__version__ = "0.1.0"
