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

NB["persistence_length_optimization"] = notebook([
    md("""# Fitting stacking strength to a persistence-length target

DNA's bending stiffness — the **persistence length** Lp — is an emergent,
trajectory-level property: no single snapshot defines it. Because the
whole pipeline (Langevin dynamics → local helical axes → tangent
correlation decay → exponential fit) is one differentiable JAX program,
`d Lp / d eps_stack` comes out of a single `jax.grad`, and a plain
optimizer loop can tune the force field toward a target stiffness.

Mirrors the reference's `examples/oxdna/persistence_length_optimization.ipynb`
workflow on the TPU-native direct-differentiation path."""),
    code(COMMON_SETUP + '''
import optax

import mythos_tpu.energy.dna1 as dna1
from mythos_tpu import spaces
from mythos_tpu.io.synthetic import synthetic_duplex
from mythos_tpu.observables import PersistenceLength
from mythos_tpu.observables.base import get_duplex_quartets

N_BP = 16          # duplex length (production fits use hundreds of bp)
N_SIM_STEPS = 400
N_OPT_STEPS = 2
TARGET_LP = 47.0   # oxDNA simulation units (~40 nm)
'''),
    md("""## System and simulator

A synthetic ideal duplex; the simulator emits every 50th state so the Lp
estimator averages over the trajectory, and `checkpoint_every` keeps the
backward pass memory bounded."""),
    code('''
from mythos_tpu.rigid_body import RigidBody
from mythos_tpu.simulators import NoNeighborList, StaticSimulatorParams, TpuSimulator

topology, init = synthetic_duplex(N_BP)
energy_fn = dna1.create_default_energy_fn(topology)
sim_cfg, _ = dna1.default_configs()
kT, dt = float(sim_cfg["kT"]), float(sim_cfg["dt"])
sim = TpuSimulator(
    energy_fn=energy_fn,
    simulator_params=StaticSimulatorParams(
        seq=jnp.asarray(topology.seq),
        mass=RigidBody(center=jnp.array([1.0]), orientation=jnp.array([[1.0, 1.0, 1.0]])),
        gamma=RigidBody(center=jnp.array([kT / 2.5]), orientation=jnp.array([kT / 7.5])),
        bonded_neighbors=jnp.asarray(topology.bonded_neighbors),
        # remat boundary every 4 of the 8 emitted chunks (it must divide them)
        checkpoint_every=4, dt=dt, kT=kT,
    ),
    space=spaces.free(),
    neighbors=NoNeighborList(unbonded_nbrs=topology.unbonded_neighbors),
    save_every=50,
)
params = energy_fn.opt_params()
'''),
    md("""## The observable

`PersistenceLength` builds a local helical axis per base-pair quartet,
computes tangent-tangent correlations along the duplex, and fits the
exponential decay — all in jnp, so it differentiates."""),
    code('''
lp_obs = PersistenceLength(
    rigid_body_transform_fn=dna1.default_transform_fn(),
    quartets=get_duplex_quartets(topology.n_nucleotides // 2),
    displacement_fn=spaces.free()[0],
)

@jax.jit
def loss_fn(opt_params, key):
    out = sim.run(opt_params, init, N_SIM_STEPS, key)
    lp = lp_obs(out.observables[0])
    return (lp - TARGET_LP) ** 2, lp

grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
'''),
    md("""## Optimize

Stacking strength is the dominant stiffness knob in oxDNA — watch
`eps_stack_base` receive gradient through the dynamics. (A 16-bp helix
over a few hundred steps gives a noisy Lp estimate; the point here is
the differentiable pipeline, not a converged fit.)"""),
    code('''
opt = optax.adam(3e-3)
opt_state = opt.init(params)
for step in range(N_OPT_STEPS):
    (loss, lp), grads = grad_fn(params, jax.random.PRNGKey(step))
    updates, opt_state = opt.update(grads, opt_state)
    params = optax.apply_updates(params, updates)
    print(f"step {step}: Lp={float(lp):7.2f} su (target {TARGET_LP})  "
          f"d eps_stack_base={float(grads['eps_stack_base']):+.3e}")
'''),
])

NB["melting_temperature_optimization"] = notebook([
    md("""# Melting-temperature fitting by umbrella reweighting

The duplex melting temperature Tm is an *ensemble* property: the
temperature where bound and unbound states are equally likely. The
workflow (mirroring the reference's
`examples/oxdna/melting_temperature_optimization.ipynb`):

1. an umbrella-sampling run produces a trajectory with per-state bind
   indicators and umbrella weights (here: the shipped golden fixture, so
   no oxDNA binary is needed);
2. `MeltingTemp` re-evaluates the trajectory's energies at a grid of
   temperatures, Boltzmann-reweights the umbrella-weighted counts,
   applies the finite-size correction, and interpolates the 50% point;
3. the whole chain is differentiable, so `d Tm / d eps_hb` drives a
   gradient loop — **no resimulation inside the loop** (the DiffTRe
   approximation; re-sample when n_eff degrades)."""),
    code(COMMON_SETUP + '''
jax.config.update("jax_enable_x64", True)   # reweighting spans ~70 kT of energy

from pathlib import Path

import optax

import mythos_tpu.energy.dna1 as dna1
import mythos_tpu.io.topology as top
import mythos_tpu.io.trajectory as traj
from mythos_tpu import spaces
from mythos_tpu.energy.base import ComposedEnergyFunction
from mythos_tpu.observables.melting_temp import MeltingTemp
from mythos_tpu.simulators.io import SimulatorTrajectory
from mythos_tpu.simulators.oxdna.utils import read_energy

TEST_DATA = Path(os.environ.get("MYTHOS_TPU_TESTDATA", "/root/reference/data/test-data"))
SIM_KT = 0.10238333333333333          # the umbrella run's temperature (307.15 K)
KT_RANGE = 0.1 * jnp.linspace(280.0, 350.0, 20) / 300.0
TARGET_SHIFT_K = 5.0                  # ask for a 5 K higher Tm
N_OPT_STEPS = 4
'''),
    md("""## Load the umbrella-sampled trajectory

`read_energy` parses oxDNA's umbrella `energy.dat` (bind indicator +
umbrella weight per state); the trajectory is ordinary oxDNA text
output."""),
    code('''
base = TEST_DATA / "melting_temp"
topology = top.from_oxdna_file(base / "sys.top")
trajectory = traj.from_file(base / "trajectory.dat", topology.strand_counts, is_5p_3p=False)
energy = read_energy(base)
bind_states = energy["bond"].to_numpy()
umbrella_weights = energy["weight"].to_numpy()
print(f"{len(trajectory.states)} states, "
      f"{int(bind_states.sum())} bound, box from conf header")
'''),
    md("""## Energy function + the Tm observable

The energy function re-evaluates every state at each grid temperature
inside `MeltingTemp` (`kt` is rebound per evaluation, so its
temperature-dependent terms — stacking's `eps = base + coeff*kT` —
respond correctly)."""),
    code('''
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
tm0 = float(melting(trajectory=sim_traj, bind_states=bind_states,
                    umbrella_weights=umbrella_weights, opt_params=params))
print(f"initial Tm = {tm0:.6f} kT  ({tm0 / 0.1 * 300:.1f} K)")
'''),
    md("""## Retune `eps_hb` toward a shifted target

Hydrogen-bond strength is the natural Tm knob. Each step re-runs only
the reweighting — milliseconds, not a new simulation."""),
    code('''
target = jnp.asarray(tm0 + 0.1 * TARGET_SHIFT_K / 300.0)

@jax.jit
def loss_fn(eps_hb):
    p = dict(params, eps_hb=eps_hb)
    tm = melting(trajectory=sim_traj, bind_states=bind_states,
                 umbrella_weights=umbrella_weights, opt_params=p)
    return (tm - target) ** 2 * 1e6, tm

eps = jnp.asarray(params["eps_hb"])
opt = optax.adam(2e-3)
state = opt.init(eps)
for step in range(N_OPT_STEPS):
    (loss, tm), g = jax.value_and_grad(loss_fn, has_aux=True)(eps)
    updates, state = opt.update(g, state)
    eps = optax.apply_updates(eps, updates)
    print(f"step {step}: Tm={float(tm):.6f} (target {float(target):.6f})  "
          f"eps_hb={float(eps):.4f}  grad={float(g):+.3f}")
'''),
    md("""In production the optimizer callback recomputes umbrella weights
from the last histogram and re-triggers sampling when the reweighting's
effective sample size degrades — see
`mythos_tpu/simulators/oxdna/` (`oxDNAUmbrellaSampler`) and the
reference's notebook for the full loop."""),
])

NB["multi_trajectory_optimization"] = notebook([
    md("""# Multi-trajectory DiffTRe: several simulators, one objective

Production fits pool statistics from several independently seeded
trajectories. Here N replica simulators each expose a trajectory; one
`DiffTReObjective` concatenates them (equilibration-sliced, per-segment
n_eff guarded) and yields a single reweighted gradient; the
`PoolOptimizer` schedules everything, re-triggering exactly the
simulators whose statistics have gone stale.

This is the reference's `RayOptimizer` scheduling semantics
(`mythos/optimization/optimization.py`) on an in-process worker pool —
replicas that are JAX programs don't need an object store."""),
    code(COMMON_SETUP + '''
import optax

import mythos_tpu.energy.dna1 as dna1
from mythos_tpu import spaces
from mythos_tpu.io.synthetic import synthetic_duplex
from mythos_tpu.losses import ObservableLossFn, SquaredError
from mythos_tpu.observables import PropellerTwist
from mythos_tpu.observables.propeller import TARGETS
from mythos_tpu.optimization import DiffTReObjective, PoolOptimizer
from mythos_tpu.rigid_body import RigidBody
from mythos_tpu.simulators import NoNeighborList, StaticSimulatorParams, TpuSimulator
from mythos_tpu.simulators.base import BoundSimulator
from mythos_tpu.ui.loggers import ConsoleLogger

N_BP = 8
N_REPLICAS = 2
SIM_STEPS = 300
SAVE_EVERY = 50
N_OPT_STEPS = 2
'''),
    code('''
topology, init = synthetic_duplex(N_BP)
energy_fn = dna1.create_default_energy_fn(topology)
sim_cfg, _ = dna1.default_configs()
kT, dt = float(sim_cfg["kT"]), float(sim_cfg["dt"])
base = TpuSimulator(
    energy_fn=energy_fn,
    simulator_params=StaticSimulatorParams(
        seq=jnp.asarray(topology.seq),
        mass=RigidBody(center=jnp.array([1.0]), orientation=jnp.array([[1.0, 1.0, 1.0]])),
        gamma=RigidBody(center=jnp.array([kT / 2.5]), orientation=jnp.array([kT / 7.5])),
        bonded_neighbors=jnp.asarray(topology.bonded_neighbors),
        checkpoint_every=0, dt=dt, kT=kT,
    ),
    space=spaces.free(),
    neighbors=NoNeighborList(unbonded_nbrs=topology.unbonded_neighbors),
    save_every=SAVE_EVERY,
)
params = energy_fn.opt_params()
'''),
    md("""## Replicas

`BoundSimulator` wraps one simulator with a name, fixed run args, and its
own seed stream (an invocation counter guarantees fresh keys on every
optimizer-triggered rerun)."""),
    code('''
sims = [
    BoundSimulator(name=f"replica_{i}", simulator=base,
                   run_args=(init, SIM_STEPS), seed=i)
    for i in range(N_REPLICAS)
]
required = tuple(name for s in sims for name in s.exposes())
print("objective consumes:", required)
'''),
    md("""## One objective over all trajectories

The DiffTRe objective stitches the replica trajectories together and
computes the reweighted observable loss; when the parameters drift far
enough that n_eff drops below threshold on ANY segment, it reports
not-ready and the optimizer reruns the simulators."""),
    code('''
bps = jnp.array([[i, topology.n_nucleotides - 1 - i] for i in range(N_BP)], dtype=jnp.int32)
obs_loss = ObservableLossFn(
    observable=PropellerTwist(
        rigid_body_transform_fn=dna1.default_transform_fn(), h_bonded_base_pairs=bps
    ),
    loss_fn=SquaredError(),
    return_observable=True,
)

def grad_or_loss_fn(ref_states, weights, energy_fn, opt_params, observables):
    loss, measured = obs_loss(ref_states, TARGETS["oxDNA"], weights)
    return loss, (("propeller_twist", measured), None)

objective = DiffTReObjective(
    name="propeller",
    required_observables=required,
    grad_or_loss_fn=grad_or_loss_fn,
    energy_fn=energy_fn,
    n_equilibration_steps=2,
)
optimizer = PoolOptimizer(
    objectives=[objective],
    simulators=sims,
    aggregate_grad_fn=lambda grads: grads[0],  # a single objective
    optimizer=optax.adam(1e-3),
    logger=ConsoleLogger(),
)
out = optimizer.run(params, N_OPT_STEPS)
print("final eps_hb:", float(out.opt_params["eps_hb"]))
'''),
    md("""The pool runs replicas concurrently (thread workers around jitted
programs release the GIL); `SchedulerHints` on simulators/objectives
size the pool the same way the reference's Ray resource hints sized its
cluster tasks."""),
])

NB["replica_mesh_optimization"] = notebook([
    md("""# Replica parallelism over a device mesh

Where the reference fanned replica simulators out as Ray tasks, the
TPU-native equivalent runs N replicas (different PRNG streams) as ONE
SPMD program over a `jax.sharding.Mesh`: each device integrates its own
trajectory, and per-replica gradients combine with an ICI `psum` —
no object store, no host round-trips.

This notebook uses a virtual 4-device CPU mesh (set **before** importing
jax), so it runs anywhere; on real hardware the same code spans TPU
chips."""),
    code('''
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()

import jax
import jax.numpy as jnp
import numpy as np
import optax

print(jax.devices())
'''),
    code('''
import mythos_tpu.energy.dna1 as dna1
from mythos_tpu import spaces
from mythos_tpu.io.synthetic import synthetic_duplex
from mythos_tpu.observables import PropellerTwist
from mythos_tpu.observables.propeller import TARGETS
from mythos_tpu.parallel import make_mesh, replica_grad_fn
from mythos_tpu.rigid_body import RigidBody
from mythos_tpu.simulators import NoNeighborList, StaticSimulatorParams, TpuSimulator

N_BP = 8
SIM_STEPS = 100
N_REPLICAS = 4
N_OPT_STEPS = 2

topology, init = synthetic_duplex(N_BP)
energy_fn = dna1.create_default_energy_fn(topology)
sim_cfg, _ = dna1.default_configs()
kT, dt = float(sim_cfg["kT"]), float(sim_cfg["dt"])
simulator = TpuSimulator(
    energy_fn=energy_fn,
    simulator_params=StaticSimulatorParams(
        seq=jnp.asarray(topology.seq),
        mass=RigidBody(center=jnp.array([1.0]), orientation=jnp.array([[1.0, 1.0, 1.0]])),
        gamma=RigidBody(center=jnp.array([kT / 2.5]), orientation=jnp.array([kT / 7.5])),
        bonded_neighbors=jnp.asarray(topology.bonded_neighbors),
        checkpoint_every=50, dt=dt, kT=kT,
    ),
    space=spaces.free(),
    neighbors=NoNeighborList(unbonded_nbrs=topology.unbonded_neighbors),
)
params = energy_fn.opt_params()
'''),
    md("""## Per-replica loss, mesh-averaged gradient

`replica_grad_fn` shard_maps the (loss, grad) computation over the mesh's
replica axis: each device runs the full trajectory for its own key and
the results `psum` across ICI. The returned function is an ordinary
jittable callable."""),
    code('''
bps = jnp.array([[i, topology.n_nucleotides - 1 - i] for i in range(N_BP)], dtype=jnp.int32)
observable = PropellerTwist(
    rigid_body_transform_fn=dna1.default_transform_fn(), h_bonded_base_pairs=bps
)

def loss_fn(p, key):
    out = simulator.run(p, init, SIM_STEPS, key)
    twist = jnp.mean(observable(out.observables[0]))
    return (twist - TARGETS["oxDNA"]) ** 2

mesh = make_mesh(N_REPLICAS)
grad_step = replica_grad_fn(loss_fn, mesh)

opt = optax.adam(1e-3)
opt_state = opt.init(params)
key = jax.random.PRNGKey(0)
for step in range(N_OPT_STEPS):
    key, subkey = jax.random.split(key)
    keys = jax.random.key_data(jax.random.split(subkey, N_REPLICAS))
    loss, grads = grad_step(params, keys)
    updates, opt_state = opt.update(grads, opt_state)
    params = optax.apply_updates(params, updates)
    print(f"step {step}: mean replica loss {float(loss):8.3f}  "
          f"d eps_stack_base={float(grads['eps_stack_base']):+.3e}")
'''),
    md("""Scaling out: multi-host TPU pods keep the replica axis on ICI/DCN
via the same mesh; spatially sharding ONE large system across chips is
the other axis (`mythos_tpu/parallel/spatial.py`)."""),
])

NB["martini_bottom_up_optimization"] = notebook([
    md("""# Bottom-up MARTINI fitting with Wasserstein distances

Bottom-up coarse-grained fitting matches the CG model's structural
*distributions* (bond lengths, angles) to reference data. The
reference's workflow samples with GROMACS and reweights with DiffTRe;
here the sampler is the native in-process MARTINI MD
(`mythos_tpu/simulators/martini.py`), so the Wasserstein-1 distance
between the current and target bond-length distributions differentiates
DIRECTLY through the dynamics — no subprocesses, no reweighting.

Flow: simulate a small DLPC bilayer at reference parameters → record the
PO4–C1A bond-length distribution as the "experiment" → perturb the
equilibrium bond length → recover it by gradient descent on W1."""),
    code(COMMON_SETUP + '''
import optax

from mythos_tpu.energy.martini.systems import default_bilayer_terms, lattice_bilayer
from mythos_tpu.observables.bond_distances import BondDistances
from mythos_tpu.observables.wasserstein import WassersteinDistance
from mythos_tpu.simulators import MartiniSimulator

BOND = "DLPC_PO4_C1A"
N_STEPS = 200
N_OPT_STEPS = 3
'''),
    code('''
topology, pos, box, masses = lattice_bilayer(4, 4, water_layers=2)
sim = MartiniSimulator(
    energy_fns=default_bilayer_terms(topology),
    box=jnp.asarray(box),
    masses=jnp.asarray(masses),
    dt=0.02,
    save_every=20,
)
pos0 = jnp.asarray(pos)
bond_obs = BondDistances(topology=topology, bond_name=BOND)

# the "experiment": distributions sampled at the true parameters
ref = sim.run(None, pos0, N_STEPS, jax.random.PRNGKey(0)).observables[0]
target = bond_obs(ref).flatten()
print(f"target <{BOND}> = {float(target.mean()):.4f} nm over {target.size} samples")
'''),
    md("""## Fit back the perturbed bond length

`WassersteinDistance` computes the 1-D W1 distance between sorted
samples — smooth in the parameters, unlike histogram losses. The bonded
parameter names (`bond_r0_DLPC_PO4_C1A`, ...) are the same contract the
GROMACS topology parser uses."""),
    code('''
w1 = WassersteinDistance(observable=bond_obs, v_distribution=target)
KEY = "bond_r0_" + BOND
TRUE_R0 = 0.47   # the MARTINI reference value the target was sampled at

@jax.jit
def loss_fn(p, key):
    traj = sim.run(p, pos0, N_STEPS, key).observables[0]
    return w1(traj)

params = {KEY: jnp.asarray(0.40)}   # start 0.7 A short of the truth
opt = optax.adam(2e-2)
state = opt.init(params)
for step in range(N_OPT_STEPS):
    loss, g = jax.value_and_grad(loss_fn)(params, jax.random.PRNGKey(10 + step))
    updates, state = opt.update(g, state)
    params = optax.apply_updates(params, updates)
    print(f"step {step}: W1={float(loss):.4f}  {KEY}={float(params[KEY]):.4f} "
          f"(true {TRUE_R0:.4f})")
'''),
    md("""The same machinery extends to angle distributions
(`TripletAngles` + `WassersteinDistance`) and to multi-system fits — see
`examples/scripts/martini_full_reparameterization.py` for the
YAML-driven version covering several lipids at once."""),
])


if __name__ == "__main__":
    import pathlib

    out_dir = pathlib.Path(__file__).parent
    for name, nb in NB.items():
        path = out_dir / f"{name}.ipynb"
        path.write_text(json.dumps(nb, indent=1))
        print("wrote", path)
