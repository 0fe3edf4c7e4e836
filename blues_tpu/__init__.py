"""blues_tpu: a TPU-native enhanced-sampling (MD + NCMC) framework.

Brand-new implementation of the capabilities of MobleyLab/blues on
JAX/XLA/Pallas. See SURVEY.md for the structural map of the reference.
"""

__version__ = "0.1.0"
