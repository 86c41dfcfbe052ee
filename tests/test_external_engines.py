"""External-engine wrapper tests with mocked binaries.

Mirrors the reference's strategy (mythos/simulators/oxdna/tests/test_oxdna.py,
lammps tests): monkeypatch ``run_command`` / trajectory reads so the full
input-rewrite -> run -> read-back protocol is exercised without oxDNA,
GROMACS, or LAMMPS installed.
"""

from pathlib import Path
from unittest.mock import MagicMock

import jax.numpy as jnp
import numpy as np
import pytest

import mythos_tpu.io.oxdna_input as oxdna_io
import mythos_tpu.simulators.io as sio
from mythos_tpu.rigid_body import RigidBody
from mythos_tpu.simulators.oxdna import oxdna as oxdna_mod
from mythos_tpu.simulators.oxdna.oxdna import oxDNASimulator
from mythos_tpu.simulators.lammps import lammps_oxdna as lmp_mod


class _FakeEnergyFn:
    def with_params(self, params):
        self._params = dict(params)
        return self

    def params_dict(self, exclude_non_optimizable=False):
        return getattr(self, "_params", {})


def _fake_traj(n_states=3, n=4):
    body = RigidBody(
        center=jnp.zeros((n_states, n, 3)),
        orientation=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n_states, n, 1)),
    )
    return sio.SimulatorTrajectory.from_rigid_body(
        body, temperature=jnp.full(n_states, 0.1)
    )


@pytest.fixture
def oxdna_dir(tmp_path):
    d = tmp_path / "sys"
    d.mkdir()
    oxdna_io.write(
        {
            "T": "300K",
            "steps": 100,
            "trajectory_file": "trajectory.dat",
            "energy_file": "energy.dat",
            "conf_file": "init.conf",
            "topology": "sys.top",
        },
        d / "input",
    )
    return d


def test_oxdna_requires_exactly_one_binary_source(oxdna_dir):
    with pytest.raises(ValueError, match="one and only one"):
        oxDNASimulator(energy_fn=_FakeEnergyFn(), input_dir=oxdna_dir)
    with pytest.raises(ValueError, match="one and only one"):
        oxDNASimulator(
            energy_fn=_FakeEnergyFn(),
            input_dir=oxdna_dir,
            binary_path=Path("/bin/true"),
            source_path=Path("/src"),
        )


def test_oxdna_run_seeds_input_and_invokes_binary(oxdna_dir, monkeypatch):
    calls = []
    monkeypatch.setattr(oxdna_mod, "run_command", lambda cmd, **kw: calls.append(cmd))
    sim = oxDNASimulator(
        energy_fn=_FakeEnergyFn(),
        input_dir=oxdna_dir,
        binary_path=Path("/fake/oxDNA"),
        ignore_params=True,
        overwrite_input=True,
        input_overrides={"steps": 7},
    )
    monkeypatch.setattr(
        oxDNASimulator, "_read_trajectory", MagicMock(return_value=_fake_traj())
    )
    out = sim.run_simulation(oxdna_dir, opt_params={"eps": 1.0}, seed=42)
    assert len(calls) == 1 and str(calls[0][0]) == "/fake/oxDNA"
    config = oxdna_io.read(oxdna_dir / "input")
    assert config["seed"] == 42
    assert config["steps"] == 7
    assert len(out.observables) == 1


def test_oxdna_params_without_source_raises(oxdna_dir, monkeypatch):
    monkeypatch.setattr(oxdna_mod, "run_command", lambda cmd, **kw: None)
    sim = oxDNASimulator(
        energy_fn=_FakeEnergyFn(),
        input_dir=oxdna_dir,
        binary_path=Path("/fake/oxDNA"),
        overwrite_input=True,
    )
    with pytest.raises(ValueError, match="ignore_params"):
        sim.run_simulation(oxdna_dir, opt_params={"eps": 1.0}, seed=1)


def test_oxdna_build_writes_model_h_and_calls_toolchain(oxdna_dir, tmp_path, monkeypatch):
    src = tmp_path / "oxdna-src"
    (src / "src").mkdir(parents=True)
    (src / "src" / "model.h").write_text(
        "#ifndef MODEL_H_\n#define MODEL_H_\n"
        "#define FENE_EPS 2.0f\n#define FENE_R0_OXDNA 0.7525f\n"
        "#endif\n"
    )
    calls = []
    monkeypatch.setattr(oxdna_mod, "run_command", lambda cmd, **kw: calls.append([str(c) for c in cmd]))
    monkeypatch.setenv(oxdna_mod.CMAKE_BIN_ENV_VAR, "/fake/cmake")
    monkeypatch.setenv(oxdna_mod.MAKE_BIN_ENV_VAR, "/fake/make")

    fake_fn = _FakeEnergyFn()
    sim = oxDNASimulator(
        energy_fn=fake_fn,
        input_dir=oxdna_dir,
        source_path=src,
        overwrite_input=True,
    )
    sim.build(input_dir=oxdna_dir, new_params={"eps_backbone": 3.25})
    model_h = oxdna_dir / "oxdna-build" / "model.h"
    assert model_h.exists()
    assert "FENE_EPS 3.25" in model_h.read_text().replace("f ", " ").replace("3.25f", "3.25 ")
    assert any("cmake" in c[0] for c in calls)
    assert any("make" in c[0] for c in calls)


def test_lammps_variable_and_seed_rewrite(tmp_path):
    lines = [
        "variable kt equal 0.1",
        "variable seed equal 1",
        "pair_coeff * * oxdna/excv 2.0 0.7 0.675 2.0 0.515 0.5 2.0 0.33 0.32",
        "dump out all custom 100 trajectory.dat id mol type x y z ix iy iz vx vy vz fx fy fz c_quat[1] c_quat[2] c_quat[3] c_quat[4] angmomx angmomy angmomz",
        "run 100",
    ]
    updated = lmp_mod._lammps_oxdna_replace_inputs(
        lines, {}, seed=99, variables={"kt": 0.25}
    )
    text = "\n".join(updated)
    assert "variable kt equal 0.25" in text
    assert "variable seed equal 99" in text


def test_lammps_run_protocol(tmp_path, monkeypatch):
    d = tmp_path / "lmp"
    d.mkdir()
    (d / "in.lammps").write_text(
        "variable kt equal 0.1\n"
        "variable seed equal 1\n"
        "dump out all custom 100 trajectory.dat id mol type x y z ix iy iz vx vy vz fx fy fz "
        "c_quat[1] c_quat[2] c_quat[3] c_quat[4] angmomx angmomy angmomz\n"
        "run 10\n"
    )
    calls = []
    monkeypatch.setattr(lmp_mod, "run_command", lambda cmd, **kw: calls.append(cmd))

    class _Traj:
        state_rigid_body = RigidBody(
            center=jnp.zeros((2, 4, 3)),
            orientation=jnp.tile(jnp.array([1.0, 0, 0, 0]), (2, 4, 1)),
        )

    monkeypatch.setattr(lmp_mod, "_read_lammps_output", lambda path: _Traj())
    sim = lmp_mod.LAMMPSoxDNASimulator(
        energy_fn=_FakeEnergyFn(),
        input_dir=d,
        input_file_name="in.lammps",
        variables={"kt": 0.1},
        overwrite_input=True,
    )
    out = sim.run_simulation(d, params={}, seed=3)
    assert calls and calls[0][0] == "lmp"
    assert len(out.observables) == 1
    assert "variable seed equal 3" in (d / "in.lammps").read_text()
    np.testing.assert_allclose(np.asarray(out.observables[0].temperature), 0.1)
