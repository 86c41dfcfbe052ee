"""GROMACS wrapper and oxDNA umbrella-sampler protocol tests (mocked).

Mirrors the reference's mocked-engine strategy (mythos/simulators/gromacs/
tests, oxdna umbrella tests): grompp/mdrun and the oxDNA binary are
monkeypatched; the input-rewrite and weight-recompute protocols run for real.
"""

from pathlib import Path
from unittest.mock import MagicMock

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

import mythos_tpu.io.oxdna_input as oxdna_io
import mythos_tpu.simulators.io as sio
from mythos_tpu.rigid_body import RigidBody
from mythos_tpu.simulators.gromacs import gromacs as gmx_mod
from mythos_tpu.simulators.gromacs.gromacs import GromacsSimulator
from mythos_tpu.simulators.oxdna import oxdna as oxdna_mod
from mythos_tpu.simulators.oxdna.oxdna import _reweight_from_histogram, oxDNAUmbrellaSampler


class _FakeEnergyFn:
    def with_params(self, params):
        self._params = dict(params)
        return self

    def params_dict(self, exclude_non_optimizable=False):
        return getattr(self, "_params", {})


def _fake_traj(n_states=2, n=4):
    body = RigidBody(
        center=jnp.zeros((n_states, n, 3)),
        orientation=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n_states, n, 1)),
    )
    return sio.SimulatorTrajectory.from_rigid_body(body, temperature=jnp.full(n_states, 0.1))


@pytest.fixture
def gmx_dir(tmp_path):
    d = tmp_path / "membrane"
    d.mkdir()
    (d / "md.mdp").write_text("integrator = md\nnsteps = 100\nref-t = 300\n")
    (d / "topol.top").write_text("; topology\n[ system ]\nmembrane\n")
    (d / "membrane.gro").write_text("gro\n")
    (d / "index.ndx").write_text("[ System ]\n")
    return d


def test_gromacs_missing_inputs_raise(tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    with pytest.raises(FileNotFoundError, match="md.mdp"):
        GromacsSimulator(energy_fn=_FakeEnergyFn(), input_dir=d)


def test_gromacs_run_protocol(gmx_dir, monkeypatch):
    calls = []
    monkeypatch.setattr(gmx_mod, "run_command", lambda cmd, **kw: calls.append([str(c) for c in cmd]))
    monkeypatch.setattr(
        gmx_mod.gromacs_utils,
        "preprocess_topology",
        lambda **kw: (gmx_dir / f"production_{kw['mdp_name']}").write_text(
            "nsteps = 100\nref-t = 300\n"
        ),
    )
    monkeypatch.setattr(
        GromacsSimulator,
        "_update_topology_params",
        MagicMock(),
        raising=True,
    )
    monkeypatch.setattr(
        GromacsSimulator, "_read_trajectory", MagicMock(return_value=_fake_traj())
    )
    sim = GromacsSimulator(
        energy_fn=_FakeEnergyFn(),
        input_dir=gmx_dir,
        binary_path=Path("/fake/gmx"),
        overwrite_input=True,
    )
    out = sim.run_simulation(gmx_dir, opt_params={"bond_k_POPC_NC3_PO4": 1250.0}, seed=11)
    # no equilibration -> exactly one mdrun
    assert sum("mdrun" in c for c in calls) == 1
    assert len(out.observables) == 1
    # read_trajectory got the ref-t from the production mdp
    kwargs = GromacsSimulator._read_trajectory.call_args.kwargs
    assert kwargs.get("ref_t") == 300.0


def test_gromacs_equilibration_runs_twice(gmx_dir, monkeypatch):
    calls = []
    monkeypatch.setattr(gmx_mod, "run_command", lambda cmd, **kw: calls.append([str(c) for c in cmd]))
    monkeypatch.setattr(
        gmx_mod.gromacs_utils,
        "preprocess_topology",
        lambda **kw: (gmx_dir / f"production_{kw['mdp_name']}").write_text("ref-t = 310\n"),
    )
    monkeypatch.setattr(GromacsSimulator, "_update_topology_params", MagicMock())
    monkeypatch.setattr(GromacsSimulator, "_read_trajectory", MagicMock(return_value=_fake_traj()))
    sim = GromacsSimulator(
        energy_fn=_FakeEnergyFn(),
        input_dir=gmx_dir,
        binary_path=Path("/fake/gmx"),
        equilibration_steps=500,
        overwrite_input=True,
    )
    sim.run_simulation(gmx_dir, opt_params={}, seed=1)
    assert sum("mdrun" in c for c in calls) == 2


# Umbrella sampling -----------------------------------------------------------


@pytest.fixture
def umbrella_dir(tmp_path):
    d = tmp_path / "umbrella"
    d.mkdir()
    oxdna_io.write(
        {
            "T": "330K",
            "umbrella_sampling": 1,
            "op_file": "op.txt",
            "weights_file": "wfile.txt",
            "trajectory_file": "trajectory.dat",
            "energy_file": "energy.dat",
            "last_hist_file": "last_hist.dat",
        },
        d / "input",
    )
    (d / "op.txt").write_text("{\norder_parameter = bond\nname = all_native_bonds\n}\n")
    (d / "wfile.txt").write_text("0 8.\n1 4.\n")
    return d


def test_umbrella_requires_config(tmp_path):
    d = tmp_path / "plain"
    d.mkdir()
    oxdna_io.write({"T": "300K"}, d / "input")
    with pytest.raises(ValueError, match="umbrella_sampling"):
        oxDNAUmbrellaSampler(
            energy_fn=_FakeEnergyFn(),
            input_dir=d,
            binary_path=Path("/fake/oxDNA"),
            ignore_params=True,
        )


def test_reweight_from_histogram():
    hist = pd.DataFrame(
        {
            "op": [0, 1, 2],
            "count": [10, 20, 5],
            "unbiased_count": [2.0, 8.0, 0.0],
        }
    )
    w = _reweight_from_histogram(hist)
    # w ~ 1/unbiased_count, normalized by the min; zero-count bins get 0
    np.testing.assert_allclose(w.loc[0, "weights"], 4.0)
    np.testing.assert_allclose(w.loc[1, "weights"], 1.0)
    np.testing.assert_allclose(w.loc[2, "weights"], 0.0)


def test_umbrella_run_protocol(umbrella_dir, monkeypatch):
    monkeypatch.setattr(oxdna_mod, "run_command", lambda cmd, **kw: None)
    monkeypatch.setattr(
        oxdna_mod.oxDNASimulator, "_read_trajectory", MagicMock(return_value=_fake_traj())
    )
    energy_df = pd.DataFrame({"time": [0, 1], "potential_energy": [-1.0, -1.1]})
    monkeypatch.setattr(oxdna_mod.oxdna_utils, "read_energy", lambda d: energy_df)
    hist = pd.DataFrame({"op": [0, 1], "count": [3, 4], "unbiased_count": [1.0, 4.0]})
    monkeypatch.setattr(oxdna_mod.oxdna_utils, "read_last_hist", lambda d: hist)

    sim = oxDNAUmbrellaSampler(
        energy_fn=_FakeEnergyFn(),
        input_dir=umbrella_dir,
        binary_path=Path("/fake/oxDNA"),
        ignore_params=True,
        overwrite_input=True,
    )
    weights_in = pd.DataFrame({"weights": [2.0, 1.0]}, index=pd.Index([0, 1], name="op"))
    out = sim.run_simulation(umbrella_dir, opt_params=None, weights=weights_in, seed=5)

    # the provided weights were written to the weights file
    assert "2.0" in (umbrella_dir / "wfile.txt").read_text()
    # trajectory + energy_info exposed; next-iteration weights in state
    assert len(out.observables) == 2
    assert "weights" in out.state
    np.testing.assert_allclose(out.state["weights"].loc[0, "weights"], 4.0)
    np.testing.assert_allclose(out.state["weights"].loc[1, "weights"], 1.0)
