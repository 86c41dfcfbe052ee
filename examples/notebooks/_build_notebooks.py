"""Generate the example-notebook gallery (run from repo root).

Each notebook is real teaching material: narrative markdown, inline
parameters (no argparse), small CPU-runnable sizes, mirroring the style of
the reference gallery (/root/reference/examples/jaxmd/*.ipynb). Executed
outputs are produced by ``jupyter nbconvert --execute`` (see README).
"""

from __future__ import annotations

import json
import sys

def md(src):
    return {"cell_type": "markdown", "metadata": {}, "source": src.splitlines(keepends=True)}


def code(src):
    return {
        "cell_type": "code", "execution_count": None, "metadata": {},
        "outputs": [], "source": src.strip("\n").splitlines(keepends=True),
    }


def notebook(cells):
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python", "name": "python3"},
            "language_info": {"name": "python", "version": "3.12"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


COMMON_SETUP = '''
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")  # notebooks run anywhere; TPU via bench.py

import jax
import jax.numpy as jnp
import numpy as np
'''

SIM_BUILD = '''
from mythos_tpu import spaces
from mythos_tpu.rigid_body import RigidBody
from mythos_tpu.simulators import DensePairs, StaticSimulatorParams, TpuSimulator

sim = TpuSimulator(
    energy_fn=energy_fn,
    simulator_params=StaticSimulatorParams(
        seq=jnp.asarray(topology.seq),
        mass=RigidBody(center=jnp.array([1.0]), orientation=jnp.array([[1.0, 1.0, 1.0]])),
        gamma=RigidBody(center=jnp.array([kT / 2.5]), orientation=jnp.array([kT / 7.5])),
        bonded_neighbors=jnp.asarray(topology.bonded_neighbors),
        checkpoint_every=0,
        dt=dt,
        kT=kT,
    ),
    space=spaces.free(),
    neighbors=DensePairs(),
)
'''

NB = {}

NB["dna1_simulation"] = notebook([
    md("""# Simulating DNA with the oxDNA1 model

This notebook runs a short Langevin simulation of a DNA duplex with
**mythos_tpu**, a TPU-native differentiable molecular-simulation framework.
The whole molecular-dynamics loop — energy, forces, torques, and the
rigid-body BAOAB integrator — compiles into one XLA program, so the same
code runs on CPU here and on TPU kernels at scale (`bench.py`)."""),
    md("""## Imports and configuration

Everything is inline — tweak and re-run. The 16-nucleotide duplex below is
the same scale the reference's jax-md notebooks use."""),
    code(COMMON_SETUP + '''
import mythos_tpu.energy.dna1 as dna1
from mythos_tpu.io.synthetic import synthetic_duplex

N_BP = 8          # 8 base pairs = 16 nucleotides
N_STEPS = 500
SEED = 0
'''),
    md("""## Build the system

`synthetic_duplex` generates an ideal B-form helix (topology + rigid-body
state); for real systems use `mythos_tpu.io.topology.from_oxdna_file` and
`mythos_tpu.io.trajectory.from_file` on oxDNA `.top`/`.dat` files."""),
    code('''
topology, body = synthetic_duplex(N_BP)
print(f"{topology.n_nucleotides} nucleotides, {len(topology.bonded_neighbors)} bonds")
'''),
    md("""## Energy function

`create_default_energy_fn` assembles the seven-term oxDNA1 composed energy
(FENE backbone, excluded volumes, stacking, hydrogen bonding, cross- and
coaxial stacking) with the packaged TOML defaults. Dependent parameters
(the smoothing coefficients) re-derive *inside* the JAX trace, so
gradients flow through them when fitting."""),
    code('''
energy_fn = dna1.create_default_energy_fn(topology, dense_unbonded=True)
sim_config, _ = dna1.default_configs()
kT, dt = float(sim_config["kT"]), float(sim_config["dt"])
e0 = float(energy_fn(body))
print(f"initial energy per nucleotide: {e0 / topology.n_nucleotides:.4f} (oxDNA units)")
'''),
    md("""## Run Langevin dynamics

`TpuSimulator` mirrors the reference's `JaxMDSimulator` surface:
`run(opt_params, init_state, n_steps, key)` returns a
`SimulatorTrajectory`. The run function is fully jittable."""),
    code(SIM_BUILD + '''
params = energy_fn.opt_params()
out = jax.jit(lambda p, k: sim.run(p, body, N_STEPS, k))(params, jax.random.PRNGKey(SEED))
traj = out.observables[0]
print("trajectory states:", traj.center.shape[0])
'''),
    md("""## Inspect the trajectory

Center-of-mass drift and the energy under the same parameters show a
stable, thermalized run."""),
    code('''
disp = jnp.linalg.norm(traj.center[-1] - traj.center[0], axis=-1)
print(f"mean per-nucleotide displacement over {N_STEPS} steps: {float(disp.mean()):.3f} su")
e_final = float(energy_fn(RigidBody(center=traj.center[-1], orientation=traj.orientation[-1])))
print(f"energy per nucleotide: start {e0 / topology.n_nucleotides:.3f}, "
      f"end {e_final / topology.n_nucleotides:.3f}")
'''),
    md("""## Where to go next

- `propeller_twist_optimization.ipynb` — differentiate *through* this
  simulation to fit parameters.
- `difftre_propeller_fit.ipynb` — the DiffTRe reweighting estimator (no
  backprop through dynamics).
- `examples/dna2_large_system.py` + `bench.py` — the banded-stencil Pallas
  fast tier at 10k+ nucleotides on TPU."""),
])

NB["propeller_twist_optimization"] = notebook([
    md("""# Fitting parameters by differentiating through the dynamics

The headline capability of a differentiable simulator: pick an observable
(here the **propeller twist** of base pairs), define a loss against a
target value, and take `jax.grad` of the loss **through the whole Langevin
trajectory** with respect to force-field parameters.

This mirrors the reference's `examples/jaxmd/propeller_twist_optimization.ipynb`
at the same 8-bp scale."""),
    code(COMMON_SETUP + '''
import optax

import mythos_tpu.energy.dna1 as dna1
from mythos_tpu.io.synthetic import synthetic_duplex
from mythos_tpu.observables import PropellerTwist

N_BP = 8
N_SIM_STEPS = 60
TARGET_DEG = -8.0   # pull the propeller twist toward this value
N_OPT_STEPS = 2
'''),
    md("""## System, energy, simulator

Gradient checkpointing (`checkpoint_every`) bounds the memory of
backpropagating through the trajectory: only chunk boundaries are stored,
interiors recompute in the backward pass."""),
    code('''
topology, body = synthetic_duplex(N_BP)
energy_fn = dna1.create_default_energy_fn(topology, dense_unbonded=True)
sim_config, _ = dna1.default_configs()
kT, dt = float(sim_config["kT"]), float(sim_config["dt"])
''' + SIM_BUILD.replace("checkpoint_every=0", "checkpoint_every=30")),
    md("""## Observable and loss

`PropellerTwist` measures the mean angle between base normals of
hydrogen-bonded pairs. The loss is the squared error of the
trajectory-mean twist against the target."""),
    code('''
n = topology.n_nucleotides
bps = jnp.array([[i, n - 1 - i] for i in range(N_BP)], dtype=jnp.int32)
observable = PropellerTwist(
    rigid_body_transform_fn=dna1.default_transform_fn(), h_bonded_base_pairs=bps
)

def loss_fn(params, key):
    traj = sim.run(params, body, N_SIM_STEPS, key).observables[0]
    twist_deg = observable(traj).mean()   # mean over saved states
    return (twist_deg - TARGET_DEG) ** 2, twist_deg

grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
'''),
    md("""## Optimize

Two Adam steps are enough to see the loss fall and the stacking
parameters move. (Production fits run longer trajectories, more steps, and
replicas over a TPU mesh — see `examples/replica_mesh_optimization.py`.)"""),
    code('''
params = energy_fn.opt_params()
opt = optax.adam(1e-2)
opt_state = opt.init(params)
key = jax.random.PRNGKey(0)
for step in range(N_OPT_STEPS):
    key, sub = jax.random.split(key)
    (loss, twist), grads = grad_fn(params, sub)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    print(f"step {step}: loss={float(loss):8.3f}  twist={float(twist):7.2f} deg  "
          f"d eps_stack_base={float(grads['eps_stack_base']):+.3e}")
'''),
    md("""The gradient signal is real: `eps_stack_base` (and ~100 other
parameters) receive nonzero gradients through 200 integrator steps. For
fits at scale, prefer the DiffTRe estimator (next notebook) — it avoids
backprop through the dynamics entirely."""),
])

NB["difftre_propeller_fit"] = notebook([
    md("""# DiffTRe: fitting without differentiating the dynamics

DiffTRe (differentiable trajectory reweighting) treats an existing
trajectory as *data*: re-evaluate its energies under new parameters,
Boltzmann-reweight the observable, and differentiate **the reweighting**
instead of the dynamics. The effective sample size `n_eff` tells you when
the trajectory has gone stale and must be re-simulated.

This is the at-scale fitting path (it works with any backend — including
the external oxDNA/GROMACS/LAMMPS engines — because no gradients flow
through the simulator)."""),
    code(COMMON_SETUP + '''
import optax

import mythos_tpu.energy.dna1 as dna1
from mythos_tpu.io.synthetic import synthetic_duplex
from mythos_tpu.observables import PropellerTwist
from mythos_tpu.optimization.objective import compute_weights_and_neff
from mythos_tpu.rigid_body import RigidBody

N_BP = 8
N_SIM_STEPS = 200
SAVE_EVERY = 20     # 20 trajectory states
TARGET_DEG = -10.0
N_OPT_STEPS = 3
'''),
    code('''
topology, body = synthetic_duplex(N_BP)
energy_fn = dna1.create_default_energy_fn(topology, dense_unbonded=True)
sim_config, _ = dna1.default_configs()
kT, dt = float(sim_config["kT"]), float(sim_config["dt"])
''' + SIM_BUILD.replace("neighbors=DensePairs(),", "neighbors=DensePairs(),\n    save_every=SAVE_EVERY,")),
    md("""## Generate the reference trajectory once"""),
    code('''
params0 = energy_fn.opt_params()
traj = jax.jit(lambda p, k: sim.run(p, body, N_SIM_STEPS, k))(
    params0, jax.random.PRNGKey(0)
).observables[0]
states = RigidBody(center=traj.center, orientation=traj.orientation)
ref_energies = energy_fn.with_params(params0).map(states)
print("states:", states.center.shape[0])
'''),
    md("""## The DiffTRe loss

`compute_weights_and_neff` implements eqs. 4-5 of the DiffTRe paper: new
Boltzmann weights from the energy difference under trial parameters, and
the effective sample size of the reweighted ensemble."""),
    code('''
n = topology.n_nucleotides
bps = jnp.array([[i, n - 1 - i] for i in range(N_BP)], dtype=jnp.int32)
observable = PropellerTwist(
    rigid_body_transform_fn=dna1.default_transform_fn(), h_bonded_base_pairs=bps
)
beta = 1.0 / kT
per_state_twist = observable(states)   # (n_states,) per-state values

def difftre_loss(params):
    new_e = energy_fn.with_params(params).map(states)
    weights, neff = compute_weights_and_neff(beta, new_e, ref_energies)
    twist = jnp.sum(weights * per_state_twist)
    return (twist - TARGET_DEG) ** 2, (twist, neff)

grad_fn = jax.jit(jax.value_and_grad(difftre_loss, has_aux=True))
'''),
    md("""## Optimize, watching `n_eff`

When `n_eff` drops below ~0.95 the reweighted ensemble no longer
represents the trial parameters and a fresh trajectory is needed —
`mythos_tpu.optimization.DiffTReObjective` automates exactly that protocol
(not-ready + resimulation requests), matching the reference's behavior."""),
    code('''
params = params0
opt = optax.adam(5e-3)
opt_state = opt.init(params)
for step in range(N_OPT_STEPS):
    (loss, (twist, neff)), grads = grad_fn(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    print(f"step {step}: loss={float(loss):8.3f}  twist={float(twist):7.2f}  "
          f"n_eff={float(neff):.3f}")
'''),
    md("""`n_eff` stays near 1.0 for these small parameter moves, so the
single trajectory supports the whole fit. At production scale the same
loop runs with the banded-stencil Pallas tier generating trajectories at
~700k steps/min for 10k-nt systems on one TPU v5e chip."""),
])

NB["dna2_debye_simulation"] = notebook([
    md("""# oxDNA2: salt-dependent electrostatics

oxDNA2 extends oxDNA1 with Debye-Hückel screened electrostatics (plus a
revised coaxial-stacking term and grooved backbone sites). The screening
length derives from the salt concentration *inside the trace* — so salt is
just another differentiable parameter."""),
    code(COMMON_SETUP + '''
import mythos_tpu.energy.dna2 as dna2
from mythos_tpu.io.synthetic import synthetic_duplex

N_BP = 8
topology, body = synthetic_duplex(N_BP)
'''),
    md("""## Energy at two salt concentrations

Higher salt screens the backbone repulsion more strongly, lowering the
electrostatic energy's magnitude."""),
    code('''
def debye_energy(e_fn):
    w = e_fn.weights if e_fn.weights is not None else [1.0] * len(e_fn.energy_fns)
    return next(
        float(wi * t(body)) for wi, t in zip(w, e_fn.energy_fns)
        if type(t).__name__ == "Debye"
    )

for salt in (0.15, 1.0):
    e_fn = dna2.create_default_energy_fn(
        topology, dense_unbonded=True, overrides={"salt_conc": salt}
    )
    print(f"salt {salt:4.2f} M: total {float(e_fn(body)):9.4f}  "
          f"debye {debye_energy(e_fn):8.4f}")
'''),
    md("""## Half-charged ends

Like the reference (and the oxDNA2 paper), terminal nucleotides can carry
half charge — the `half_charged_ends` flag wires `topology.is_end` into
the charge product."""),
    code('''
for hce in (True, False):
    e_fn = dna2.create_default_energy_fn(
        topology, dense_unbonded=True, overrides={"half_charged_ends": hce}
    )
    print(f"half_charged_ends={hce}: debye = {debye_energy(e_fn):.5f}")
'''),
    md("""## A short dna2 simulation"""),
    code('''
energy_fn = dna2.create_default_energy_fn(topology, dense_unbonded=True)
sim_config, _ = dna2.default_configs()
kT, dt = float(sim_config["kT"]), float(sim_config["dt"])
''' + SIM_BUILD + '''
out = jax.jit(lambda p, k: sim.run(p, body, 300, k))(
    energy_fn.opt_params(), jax.random.PRNGKey(1)
)
traj = out.observables[0]
print("finite:", bool(jnp.all(jnp.isfinite(traj.center))), "states:", traj.center.shape[0])
'''),
    md("""At scale, dna2 is the flagship model of the TPU fast tier: the
banded-stencil kernel fuses all seven terms plus Debye-Hückel, the BAOAB
integrator and the thermostat into one Pallas call per neighbor-rebuild
interval (`docs/tpu.md`)."""),
])

NB["martini_bilayer_native"] = notebook([
    md("""# MARTINI lipids: native bonded + LJ energies

The MARTINI coarse-grained force field (bonds, G96 angles, shifted LJ)
runs natively — point particles in a periodic box, no external engine
needed (the `GromacsSimulator` wrapper remains available for validation
against `gmx`)."""),
    code(COMMON_SETUP + '''
from mythos_tpu.energy.martini import MartiniTopology, m2
from mythos_tpu.simulators.io import SimulatorTrajectory

# a tiny 3-bead "lipid" x 8 molecules, periodic box
rng = np.random.RandomState(0)
n_mol, beads = 8, 3
topology = MartiniTopology(
    atom_types=("Q0", "Qa", "C1") * n_mol,
    atom_names=("NC3", "PO4", "GL1") * n_mol,
    residue_names=("DMPC",) * (n_mol * beads),
    angles=jnp.asarray(np.concatenate(
        [[[0 + m * beads, 1 + m * beads, 2 + m * beads]] for m in range(n_mol)]
    )),
    bonded_neighbors=jnp.asarray(np.concatenate([
        [[0 + m * beads, 1 + m * beads], [1 + m * beads, 2 + m * beads]]
        for m in range(n_mol)
    ])),
)
box = jnp.array([6.0, 6.0, 6.0])
base = rng.uniform(1.0, 5.0, (n_mol, 3))
offsets = np.array([[0.0, 0.0, 0.0], [0.47, 0.0, 0.0], [0.94, 0.0, 0.0]])
pos = jnp.asarray((base[:, None, :] + offsets[None]).reshape(-1, 3))
traj = SimulatorTrajectory(
    center=pos,
    orientation=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n_mol * beads, 1)),
    box_size=box,
)
print(n_mol * beads, "beads in a", [float(b) for b in box], "nm box")
'''),
    md("""## Bonded + LJ terms

Parameter names derive from residue/bead names (`bond_k_DMPC_NC3_PO4`,
`lj_sigma_Q0_Qa`, ...) — the same naming contract the GROMACS topology
parser uses, so parameters round-trip to `.top` files. MARTINI 2 angles
are the G96 cosine-harmonic form; `m3.Angle` flips to plain harmonic."""),
    code('''
bond = m2.Bond.from_topology(topology, params=m2.BondConfiguration(
    bond_k_DMPC_NC3_PO4=1250.0, bond_r0_DMPC_NC3_PO4=0.47,
    bond_k_DMPC_PO4_GL1=1250.0, bond_r0_DMPC_PO4_GL1=0.47,
))
angle = m2.Angle.from_topology(topology, params=m2.AngleConfiguration(
    angle_k_DMPC_NC3_PO4_GL1=25.0, angle_theta0_DMPC_NC3_PO4_GL1=np.pi,
))
lj = m2.LJ.from_topology(topology, params=m2.LJConfiguration(
    lj_sigma_Q0_Q0=0.47, lj_epsilon_Q0_Q0=3.5,
    lj_sigma_Q0_Qa=0.47, lj_epsilon_Q0_Qa=4.0,
    lj_sigma_Qa_Qa=0.47, lj_epsilon_Qa_Qa=5.0,
    lj_sigma_Q0_C1=0.62, lj_epsilon_Q0_C1=2.0,
    lj_sigma_Qa_C1=0.62, lj_epsilon_Qa_C1=2.0,
    lj_sigma_C1_C1=0.47, lj_epsilon_C1_C1=3.5,
))
print(f"bond energy:  {float(bond(traj)):9.4f}")
print(f"angle energy: {float(angle(traj)):9.4f}")
print(f"LJ energy:    {float(lj(traj)):9.4f}")
'''),
    md("""## Differentiable in every parameter"""),
    code('''
g = jax.grad(lambda p: lj.with_params(p)(traj))(lj.opt_params())
nz = {k: float(v) for k, v in g.items() if abs(float(v)) > 1e-12}
print(f"{len(nz)} LJ parameters receive gradient; e.g.:")
for k in sorted(nz)[:4]:
    print(f"  d E / d {k} = {nz[k]:+.4f}")
'''),
    md("""For real bilayers, build `MartiniTopology` from a GROMACS TPR or
coordinate file via MDAnalysis, then fit bottom-up distributions
(`examples/martini_bottom_up_optimization.py`) or run native MD with the
barostat (`mythos_tpu/simulators/martini.py`)."""),
])

if __name__ == "__main__":
    import pathlib

    out_dir = pathlib.Path(__file__).parent
    for name, nb in NB.items():
        path = out_dir / f"{name}.ipynb"
        path.write_text(json.dumps(nb, indent=1))
        print("wrote", path)
