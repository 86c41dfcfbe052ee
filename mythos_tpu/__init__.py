"""mythos_tpu: a TPU-native differentiable molecular-simulation framework.

Capabilities mirror mythos-bio/mythos (differentiable CG simulation + fitting
of oxDNA1/2, oxRNA2, oxNA, and MARTINI models to experimental data), built
TPU-first on jax/XLA/pallas: a native rigid-body core, fixed-shape pair
kernels, lax.scan Langevin dynamics, and mesh-parallel replica optimization.
"""

__version__ = "0.1.0"
