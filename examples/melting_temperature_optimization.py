"""Melting-temperature optimization via umbrella reweighting (runnable port
of the reference's examples/oxdna/melting_temperature_optimization.ipynb).

The workflow: an oxDNA umbrella-sampling run produces a duplex trajectory
with per-state bind indicators and umbrella weights; `MeltingTemp`
reweights that single trajectory to a temperature grid, extrapolates the
duplex-yield curve, and solves f_inf(Tm) = 1/2. Because the whole chain
(energy re-evaluation -> multi-kT reweighting -> curve -> root) is one
differentiable JAX program, d Tm / d(parameters) comes from jax.grad and a
plain optimizer loop retunes the model toward a target Tm -- no
resimulation inside the loop (the DiffTRe approximation; re-run umbrella
sampling when n_eff degrades, as the reference notebook does).

Uses the shipped umbrella-sampling fixture so it runs without the oxDNA
binary: set MYTHOS_TPU_TESTDATA if the default path is unavailable.

Run: python examples/melting_temperature_optimization.py  (~3 min CPU)
"""

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_enable_x64", True)

import mythos_tpu.energy.dna1 as dna1
import mythos_tpu.io.topology as top
import mythos_tpu.io.trajectory as traj
from mythos_tpu import spaces
from mythos_tpu.energy.base import ComposedEnergyFunction
from mythos_tpu.observables.melting_temp import MeltingTemp
from mythos_tpu.simulators.io import SimulatorTrajectory
from mythos_tpu.simulators.oxdna.utils import read_energy

TEST_DATA = os.environ.get("MYTHOS_TPU_TESTDATA", "/root/reference/data/test-data")
SIM_KT = 0.10238333333333333  # the umbrella run's temperature (307.15 K)
KT_RANGE = 0.1 * jnp.linspace(280.0, 350.0, 20) / 300.0


def main() -> None:
    base = Path(TEST_DATA) / "melting_temp"
    topology = top.from_oxdna_file(base / "sys.top")
    trajectory = traj.from_file(base / "trajectory.dat", topology.strand_counts, is_5p_3p=False)
    energy = read_energy(base)
    bind_states = energy["bond"].to_numpy()
    umbrella_weights = energy["weight"].to_numpy()

    energy_fn = (
        ComposedEnergyFunction.from_lists(
            energy_fns=dna1.default_energy_fns(),
            energy_configs=dna1.default_energy_configs(),
            transform_fn=dna1.default_transform_fn(),
            displacement_fn=spaces.periodic(20.0)[0],
            topology=topology,
        )
        .with_noopt("ss_stack_weights", "ss_hb_weights", "kt")
        .with_params(kt=SIM_KT)
    )
    melting = MeltingTemp(
        rigid_body_transform_fn=dna1.default_transform_fn(),
        sim_temperature=SIM_KT,
        temperature_range=KT_RANGE,
        energy_fn=energy_fn,
    )
    sim_traj = SimulatorTrajectory.from_rigid_body(trajectory.state_rigid_body)

    params = energy_fn.opt_params()
    tm0 = float(melting(
        trajectory=sim_traj, bind_states=bind_states,
        umbrella_weights=umbrella_weights, opt_params=params,
    ))
    print(f"initial Tm = {tm0:.6f} kT ({tm0 / 0.1 * 300:.1f} K)")

    # optimize eps_hb toward a 5 K higher melting temperature
    target = jnp.asarray(tm0 + 0.1 * 5.0 / 300.0)

    @jax.jit
    def loss_fn(eps_hb):
        p = dict(params, eps_hb=eps_hb)
        tm = melting(
            trajectory=sim_traj, bind_states=bind_states,
            umbrella_weights=umbrella_weights, opt_params=p,
        )
        return (tm - target) ** 2 * 1e6, tm

    eps = jnp.asarray(params["eps_hb"])
    opt = optax.adam(2e-3)
    state = opt.init(eps)
    for step in range(8):
        (loss, tm), g = jax.value_and_grad(loss_fn, has_aux=True)(eps)
        updates, state = opt.update(g, state)
        eps = optax.apply_updates(eps, updates)
        print(f"step {step}: Tm={float(tm):.6f} target={float(target):.6f} "
              f"eps_hb={float(eps):.4f} grad={float(g):+.3f}")

    assert abs(float(tm) - float(target)) < abs(tm0 - float(target)), "no progress"
    print("done: melting temperature moved toward target by reweighting gradients")


if __name__ == "__main__":
    main()
