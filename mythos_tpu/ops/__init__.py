"""Pallas TPU kernels for the hot compute paths.

Kernels fall back to interpreter mode off-TPU (tests run them on CPU), and
every kernel has a pure-jnp reference implementation it is tested against.
"""

from mythos_tpu.ops.lj import lj_energy_forces_reference, lj_pair_energy

__all__ = ["lj_energy_forces_reference", "lj_pair_energy"]
