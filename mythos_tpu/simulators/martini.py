"""In-process MARTINI simulator: native TPU MD for coarse-grained lipids.

The reference can only sample lipid trajectories through the external
``gmx`` binary (mythos/simulators/gromacs/gromacs.py:27-206 drives grompp +
mdrun and reads the .trr back). This simulator runs the same physics
in-process: the MARTINI bond/angle/LJ terms (energy/martini) under a
point-particle BAOAB Langevin integrator with an optional semi-isotropic
Berendsen barostat (simulators/particles.py), all inside one jitted
``lax.scan`` -- fully differentiable end to end, so bilayer observables
(APL, thickness) can be fitted with direct gradients or DiffTRe without a
subprocess in the loop.

Units follow GROMACS conventions (nm, kJ/mol, ps, amu, bar): kT = kB T with
kB = 0.0083144621 kJ/mol/K, and the pressure unit conversion is baked into
``pressure0`` (16.6054 bar = 1 kJ/mol/nm^3).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import chex
import jax
import jax.numpy as jnp

from mythos_tpu.simulators import particles as pt
from mythos_tpu.simulators.base import Simulator, SimulatorOutput
from mythos_tpu.simulators.io import SimulatorTrajectory
from mythos_tpu.utils.types import Arr, Scalar

KB = 0.0083144621  # kJ/mol/K (GROMACS)
BAR = 1.0 / 16.6054  # kJ/mol/nm^3 per bar


def _term_params_view(fn, opt_params: dict) -> dict:
    """The subset of opt_params this term's configuration accepts."""
    return {k: v for k, v in opt_params.items() if k in fn.params}


@chex.dataclass(frozen=True, kw_only=True)
class MartiniSimulator(Simulator):
    """Native MARTINI MD over a periodic box.

    run(opt_params, init_positions, n_steps, key) -> SimulatorOutput with a
    SimulatorTrajectory observable (centers + per-state box, identity
    orientations). ``energy_fns`` are MARTINI terms built from one topology
    (energy/martini m2/m3 Bond/Angle/LJ); opt_params entries update every
    term whose configuration carries the key (couplings respected by the
    configurations' ``|`` merge).

    ``barostat=None`` runs NVT at the fixed ``box``; otherwise a dict
    ``{"pressure0": bar, "tau": ps, "every": int, "compressibility":
    1/bar}`` enables semi-isotropic Berendsen coupling (xy together, z
    free) -- the bilayer ensemble the reference's mdp files request.
    """

    energy_fns: list
    box: Arr
    masses: Arr  # (N,) amu
    dt: Scalar = 0.02  # ps
    kT: Scalar = KB * 305.0  # noqa: N815
    #: friction in amu/ps; tau_t = mass/gamma, so 72 gives the 1 ps
    #: coupling time GROMACS' sd integrator defaults to for MARTINI beads
    gamma: Scalar = 72.0
    save_every: int = 50
    barostat: dict | None = None
    name: str = "martini"

    def _energy_fn(self, opt_params: dict | None) -> Callable:
        fns = self.energy_fns
        if opt_params:
            fns = [
                fn.replace(params=fn.params | _term_params_view(fn, opt_params))
                for fn in fns
            ]
        n = len(fns[0].atom_types)
        quat = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 1))

        def energy(position: Arr, box: Arr) -> Scalar:
            snap = SimulatorTrajectory(center=position, orientation=quat, box_size=box)
            return sum(fn.compute_energy(snap) for fn in fns)

        return energy

    def run(
        self,
        opt_params: dict | None,
        init_positions: Arr,
        n_steps: int,
        key: Arr,
        **_kwargs: Any,
    ) -> SimulatorOutput:
        energy = self._energy_fn(opt_params)

        def shift(x: Arr, dx: Arr) -> Arr:
            return x + dx  # box wrap is applied via minimum image in terms

        init_fn, step_fn = pt.nvt_langevin_particles(
            energy, shift, self.dt, self.kT, self.gamma
        )
        state0 = init_fn(key, jnp.asarray(init_positions), jnp.asarray(self.box), self.masses)

        baro = self.barostat
        every = int(baro["every"]) if baro else 0
        if n_steps % self.save_every:
            raise ValueError("save_every must divide n_steps")

        def body(state, step_idx):
            state = step_fn(state)
            if baro:
                def couple(s):
                    return pt.berendsen_semi_isotropic(
                        energy,
                        s,
                        pressure0=baro["pressure0"] * BAR,
                        tau=baro["tau"],
                        dt=self.dt * every,
                        compressibility=baro.get("compressibility", 3e-4) / BAR,
                    )

                state = jax.lax.cond(
                    (step_idx + 1) % every == 0, couple, lambda s: s, state
                )
            return state, None

        def chunk(state, start):
            state, _ = jax.lax.scan(
                body, state, start + jnp.arange(self.save_every)
            )
            return state, (state.position, state.box)

        starts = jnp.arange(0, n_steps, self.save_every)
        state, (positions, boxes) = jax.lax.scan(chunk, state0, starts)

        n = positions.shape[1]
        quats = jnp.broadcast_to(
            jnp.array([1.0, 0.0, 0.0, 0.0]), (positions.shape[0], n, 4)
        )
        traj = SimulatorTrajectory(center=positions, orientation=quats, box_size=boxes)
        return SimulatorOutput(observables=[traj])

    def temperature(self, state: pt.ParticleLangevinState) -> Scalar:
        """Instantaneous kT from the momenta (diagnostics)."""
        twice_k = jnp.sum(state.momentum**2 * state.inv_mass)
        return twice_k / (3.0 * state.position.shape[0])
