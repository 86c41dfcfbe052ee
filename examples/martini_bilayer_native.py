"""Native MARTINI bilayer: in-process NPT simulation + APL fit, no GROMACS.

The reference's bilayer workflows shell out to gmx for every trajectory
(mythos/simulators/gromacs/gromacs.py); this example runs the same physics
end-to-end inside JAX on TPU: a lattice bilayer, semi-isotropic Berendsen
NPT with an AD-virial pressure, the AreaPerLipid observable, and a direct
gradient fit of a MARTINI LJ epsilon so the equilibrium APL matches a
target -- the differentiable-simulation workflow GROMACS cannot provide.

Run: python examples/martini_bilayer_native.py  (CPU or TPU; ~2 min)
"""

import jax
import jax.numpy as jnp
import optax

from mythos_tpu.energy.martini.systems import default_bilayer_terms, lattice_bilayer
from mythos_tpu.observables.membranes import AreaPerLipid, MembraneThickness
from mythos_tpu.simulators import MartiniSimulator


def main() -> None:
    topology, pos, box, masses = lattice_bilayer(4, 4, water_layers=2)
    print(f"bilayer: {sum(1 for r in topology.residue_names if r == 'DLPC') // 4} lipids, "
          f"{len(topology.atom_types)} beads, box {box.round(2)} nm")

    sim = MartiniSimulator(
        energy_fns=default_bilayer_terms(topology),
        box=jnp.asarray(box),
        masses=jnp.asarray(masses),
        dt=0.02,
        save_every=50,
        barostat={"pressure0": 1.0, "tau": 4.0, "every": 10},
    )
    heads = jnp.asarray(
        [i for i, nm in enumerate(topology.atom_names) if nm == "PO4"], jnp.int32
    )
    apl_obs = AreaPerLipid(head_indices=heads)
    thick_obs = MembraneThickness(thickness_indices=heads)

    # -- plain NPT trajectory -----------------------------------------------
    pos0 = jnp.asarray(pos)
    out = sim.run(None, pos0, 1000, jax.random.PRNGKey(0))
    traj = out.observables[0]
    apl = apl_obs(traj)
    print(f"APL trace (nm^2): {jnp.round(apl[::4], 3)}")
    print(f"thickness (nm):   {float(thick_obs(traj)[-1]):.2f}")

    # -- differentiable fit: tune tail-tail epsilon to hit a target APL ------
    target_apl = 0.64

    @jax.jit
    def loss_fn(eps_c1, key):
        outf = sim.run({"lj_epsilon_C1_C1": eps_c1}, pos0, 300, key)
        return (jnp.mean(apl_obs(outf.observables[0])[-3:]) - target_apl) ** 2

    eps = jnp.asarray(3.5)
    opt = optax.adam(0.1)
    opt_state = opt.init(eps)
    for step in range(5):
        loss, g = jax.value_and_grad(loss_fn)(eps, jax.random.PRNGKey(step))
        updates, opt_state = opt.update(g, opt_state)
        eps = optax.apply_updates(eps, updates)
        print(f"step {step}: loss={float(loss):.5f} eps_C1_C1={float(eps):.3f} grad={float(g):+.4f}")

    print("done: gradient-fitted a MARTINI LJ parameter with zero subprocesses")


if __name__ == "__main__":
    main()
