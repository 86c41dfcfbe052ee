#!/usr/bin/env python
"""Full MARTINI reparameterization from a directory of YAML config files.

Reads YAML configs describing lipid systems and experimental targets, builds
per-system GROMACS simulators and DiffTRe objectives, and optimizes shared
force-field parameters with the PoolOptimizer (the reference ran the same
workflow on a Ray cluster; here host tasks run on a futures pool while the
energy re-evaluation stays on device).

Usage::

    python martini_full_reparameterization.py --config-dir configs/ --opt-steps 100
    python martini_full_reparameterization.py --config-file dopc.yaml --config-file dppc.yaml

YAML config format (one file per system)::

    name: dopc_303K                # optional, defaults to filename stem
    system: /path/to/gromacs/input
    martini_version: 2             # 2 or 3
    temperature: 303
    num_sims: 1                    # optional replica count

    thickness: {target: 36.8}
    apl: {target: 66.9}
    bonds:
      units: angstrom              # angstrom (default) or nm
      DOPC:
        NC3-PO4: {distribution: ref/DOPC_NC3-PO4_bond_dist.npy}
    angles:
      units: radian                # radian (default) or degree
      DOPC:
        PO4-GL1-GL2: {distribution: ref/DOPC_PO4-GL1-GL2_angle_dist.npy}
    melting_temp:
      target: 314.0
      sim_temps: [291, 292.5, 294]
"""

from __future__ import annotations

import argparse
import functools
import operator
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import yaml

from mythos_tpu.energy.base import ComposedEnergyFunction
from mythos_tpu.energy.martini import MartiniTopology, m2, m3
from mythos_tpu.io.gromacs_input import read_params_from_topology
from mythos_tpu.losses import l2_loss
from mythos_tpu.observables import (
    BondDistancesMapped,
    TripletAnglesMapped,
    WassersteinDistanceMapped,
)
from mythos_tpu.observables.membranes import AreaPerLipid, MembraneMeltingTemp, MembraneThickness
from mythos_tpu.optimization import DiffTReObjective, PoolOptimizer
from mythos_tpu.simulators.gromacs.gromacs import KB, GromacsSimulator
from mythos_tpu.simulators.gromacs.utils import preprocess_topology
from mythos_tpu.ui.loggers import ConsoleLogger, FileLogger, MultiLogger
from mythos_tpu.utils.types import PyTree

jax.config.update("jax_enable_x64", True)

NM_PER_ANGSTROM = 0.1


def tree_mean(trees: tuple[PyTree, ...]) -> PyTree:
    """Average a sequence of gradient pytrees."""
    if len(trees) <= 1:
        return trees[0]
    summed = functools.reduce(lambda a, b: jax.tree.map(operator.add, a, b), trees)
    return jax.tree.map(lambda x: x / len(trees), summed)


def parse_args():
    p = argparse.ArgumentParser(description="Full MARTINI reparameterization from YAML configs")
    p.add_argument("--config-dir", type=Path, default=None)
    p.add_argument("--config-file", type=Path, action="append", default=[])
    p.add_argument("--opt-steps", type=int, default=100)
    p.add_argument("--learning-rate", type=float, default=5e-4)
    p.add_argument("--num-sims", type=int, default=1)
    p.add_argument("--equilibration-steps", type=int, default=200_000)
    p.add_argument("--simulation-steps", type=int, default=500_000)
    p.add_argument("--gromacs-binary", type=Path, default=None)
    p.add_argument("--metrics-file", type=Path, default=None)
    return p.parse_args()


def load_configs(args) -> list[dict]:
    paths = list(args.config_file)
    if args.config_dir is not None:
        paths.extend(sorted(args.config_dir.glob("*.yaml")))
    if not paths:
        raise SystemExit("No config files provided (use --config-dir or --config-file)")
    configs = []
    for path in paths:
        with path.open() as f:
            cfg = yaml.safe_load(f)
        cfg.setdefault("name", path.stem)
        configs.append(cfg)
    return configs


def build_energy_fn(cfg: dict, input_dir: Path, gromacs_binary):
    """Energy function + topology + initial params for one system."""
    preprocess_topology(input_dir=input_dir, gromacs_binary=gromacs_binary)
    params = read_params_from_topology(input_dir / "preprocessed.top")
    topology = MartiniTopology.from_tpr(input_dir / "preprocessed.tpr")

    version = int(cfg.get("martini_version", 2))
    angle_cls = m2.Angle if version == 2 else m3.Angle
    energy_fn = ComposedEnergyFunction(
        energy_fns=[
            m2.Bond.from_topology(topology, params=m2.BondConfiguration(**params["bond_params"])),
            angle_cls.from_topology(topology, params=m2.AngleConfiguration(**params["angle_params"])),
            m2.LJ.from_topology(topology, params=m2.LJConfiguration(**params["nonbond_params"])),
        ]
    )
    return energy_fn, topology


def build_loss(cfg: dict, topology: MartiniTopology, input_dir: Path):
    """Compose the per-system loss over the configured targets."""
    terms = []

    if "thickness" in cfg:
        po4 = [i for i, n in enumerate(topology.atom_names) if n == "PO4"]
        thickness = MembraneThickness(thickness_indices=jnp.array(po4))
        target = cfg["thickness"]["target"] * NM_PER_ANGSTROM
        terms.append(lambda traj, w: l2_loss(jnp.dot(w, thickness(traj)), target))

    if "apl" in cfg:
        po4 = [i for i, n in enumerate(topology.atom_names) if n == "PO4"]
        apl = AreaPerLipid(head_indices=jnp.array(po4))
        target = cfg["apl"]["target"] * NM_PER_ANGSTROM**2
        terms.append(lambda traj, w: l2_loss(jnp.dot(w, apl(traj)), target))

    if "bonds" in cfg:
        unit = NM_PER_ANGSTROM if cfg["bonds"].get("units", "angstrom") == "angstrom" else 1.0
        dists, names = {}, []
        for res, bonds in cfg["bonds"].items():
            if res == "units":
                continue
            for bond, spec in bonds.items():
                name = f"{res}_{bond.replace('-', '_')}"
                names.append(name)
                dists[name] = jnp.asarray(np.load(input_dir / spec["distribution"])) * unit
        wd = WassersteinDistanceMapped(
            observable=BondDistancesMapped(topology=topology, bond_names=tuple(names)),
            v_distribution_map=dists,
        )
        terms.append(lambda traj, w: sum(wd(traj, weights=w).values()))

    if "angles" in cfg:
        unit = np.pi / 180.0 if cfg["angles"].get("units", "radian") == "degree" else 1.0
        dists, names = {}, []
        for res, angles in cfg["angles"].items():
            if res == "units":
                continue
            for angle, spec in angles.items():
                name = f"{res}_{angle.replace('-', '_')}"
                names.append(name)
                dists[name] = jnp.asarray(np.load(input_dir / spec["distribution"])) * unit
        wd = WassersteinDistanceMapped(
            observable=TripletAnglesMapped(topology=topology, angle_names=tuple(names)),
            v_distribution_map=dists,
        )
        terms.append(lambda traj, w: sum(wd(traj, weights=w).values()))

    if "melting_temp" in cfg:
        po4 = [i for i, n in enumerate(topology.atom_names) if n == "PO4"]
        tm = MembraneMeltingTemp(
            head_indices=jnp.array(po4),
            temperatures=jnp.asarray(cfg["melting_temp"]["sim_temps"]),
        )
        target = cfg["melting_temp"]["target"]
        terms.append(lambda traj, w: l2_loss(tm(traj, weights=w), target))

    def loss_fn(ref_states, weights, energy_fn, opt_params, observables):
        total = sum(t(ref_states, weights) for t in terms)
        return total, (("loss_total", total), None)

    return loss_fn


def main() -> None:
    args = parse_args()
    configs = load_configs(args)

    simulators, objectives = [], []
    shared_params: dict = {}
    for cfg in configs:
        input_dir = Path(cfg["system"])
        energy_fn, topology = build_energy_fn(cfg, input_dir, args.gromacs_binary)
        shared_params |= energy_fn.opt_params()

        n_sims = int(cfg.get("num_sims", args.num_sims))
        sims = GromacsSimulator.create_n(
            n_sims,
            name=cfg["name"],
            input_dir=str(input_dir),
            energy_fn=energy_fn,
            equilibration_steps=args.equilibration_steps,
            simulation_steps=args.simulation_steps,
            binary_path=args.gromacs_binary,
            input_overrides={"ref-t": cfg["temperature"], "gen-temp": cfg["temperature"]},
        )
        simulators.extend(sims)

        objectives.append(
            DiffTReObjective(
                name=f"{cfg['name']}.objective",
                required_observables=tuple(e for s in sims for e in s.exposes()),
                grad_or_loss_fn=build_loss(cfg, topology, input_dir),
                energy_fn=energy_fn,
            )
        )

    loggers = [ConsoleLogger()]
    if args.metrics_file:
        loggers.append(FileLogger(args.metrics_file))

    optimizer = PoolOptimizer(
        objectives=objectives,
        simulators=simulators,
        aggregate_grad_fn=tree_mean,
        optimizer=optax.adam(args.learning_rate),
        logger=MultiLogger(loggers),
    )
    output = optimizer.run(shared_params, n_steps=args.opt_steps)
    print("Final parameters:")
    for key, value in sorted(output.opt_params.items()):
        print(f"  {key} = {value}")


if __name__ == "__main__":
    main()
