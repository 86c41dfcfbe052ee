"""SimulatorTrajectory concat/slice/filter/metadata semantics.

Ports the reference's container matrix (mythos/simulators/tests/test_io.py,
~564 LoC): state-axis slicing in every key form, concat with optional-field
compatibility rules, NaN-filled metadata merging, filtering, and the oxDNA
writer round trip.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mythos_tpu.simulators.io import SimulatorTrajectory


def _traj(n_states=5, n=3, kt=None, box=None, metadata=None, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n_states, n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return SimulatorTrajectory(
        center=jnp.asarray(rng.normal(size=(n_states, n, 3))),
        orientation=jnp.asarray(q),
        temperature=None if kt is None else jnp.full(n_states, kt),
        box_size=None if box is None else jnp.tile(jnp.asarray(box), (n_states, 1)),
        metadata=metadata,
    )


# -- slicing ----------------------------------------------------------------------


def test_slice_int_keeps_state_axis():
    t = _traj(5)
    s = t.slice(2)
    assert s.length() == 1
    np.testing.assert_array_equal(np.asarray(s.center[0]), np.asarray(t.center[2]))


def test_slice_range_and_negative():
    t = _traj(6, kt=0.1)
    s = t.slice(slice(1, 4))
    assert s.length() == 3
    assert s.temperature.shape == (3,)
    s2 = t.slice(slice(-2, None))
    assert s2.length() == 2
    np.testing.assert_array_equal(np.asarray(s2.center), np.asarray(t.center[-2:]))


def test_slice_index_array():
    t = _traj(6)
    s = t.slice([0, 3, 5])
    assert s.length() == 3
    np.testing.assert_array_equal(np.asarray(s.center[1]), np.asarray(t.center[3]))


def test_slice_propagates_metadata_and_box():
    t = _traj(4, box=[10.0, 10.0, 10.0]).with_state_metadata(flag=1.0)
    s = t.slice(slice(0, 2))
    assert s.metadata["flag"].shape == (2,)
    assert s.box_size.shape == (2, 3)


# -- metadata ---------------------------------------------------------------------


def test_with_state_metadata_broadcasts_and_merges():
    t = _traj(3).with_state_metadata(a=1.0)
    t = t.with_state_metadata(b=jnp.array(2.0))
    assert set(t.metadata) == {"a", "b"}
    assert t.metadata["a"].shape == (3,)
    np.testing.assert_allclose(np.asarray(t.metadata["b"]), 2.0)


def test_filter_on_metadata():
    t = _traj(4).replace(metadata={"keep": jnp.array([1.0, 0.0, 1.0, 0.0])})
    kept = t.filter(lambda m: m["keep"] > 0.5)
    assert kept.length() == 2
    np.testing.assert_array_equal(np.asarray(kept.center[1]), np.asarray(t.center[2]))


# -- concat -----------------------------------------------------------------------


def test_concat_plain():
    a, b = _traj(2, seed=1), _traj(3, seed=2)
    c = SimulatorTrajectory.concat([a, b])
    assert c.length() == 5
    np.testing.assert_array_equal(np.asarray(c.center[:2]), np.asarray(a.center))
    np.testing.assert_array_equal(np.asarray(c.center[2:]), np.asarray(b.center))
    assert c.temperature is None and c.box_size is None


def test_concat_empty_raises():
    with pytest.raises(ValueError, match="empty"):
        SimulatorTrajectory.concat([])


def test_concat_single_is_identity():
    a = _traj(2)
    assert SimulatorTrajectory.concat([a]) is a


def test_concat_temperature_compatibility():
    a, b = _traj(2, kt=0.1), _traj(2, kt=0.2)
    c = a + b  # __add__ delegates to concat
    np.testing.assert_allclose(np.asarray(c.temperature), [0.1, 0.1, 0.2, 0.2])
    with pytest.raises(ValueError, match="temperatures"):
        SimulatorTrajectory.concat([_traj(2, kt=0.1), _traj(2)])


def test_concat_box_compatibility():
    with pytest.raises(ValueError, match="box"):
        SimulatorTrajectory.concat([_traj(2, box=[1.0, 1.0, 1.0]), _traj(2)])


def test_concat_metadata_nan_fill():
    """Keys missing from one side are NaN-filled for its states."""
    a = _traj(2).with_state_metadata(only_a=1.0)
    b = _traj(3).with_state_metadata(only_b=2.0)
    c = SimulatorTrajectory.concat([a, b])
    assert set(c.metadata) == {"only_a", "only_b"}
    oa = np.asarray(c.metadata["only_a"])
    ob = np.asarray(c.metadata["only_b"])
    np.testing.assert_allclose(oa[:2], 1.0)
    assert np.all(np.isnan(oa[2:]))
    assert np.all(np.isnan(ob[:2]))
    np.testing.assert_allclose(ob[2:], 2.0)


def test_concat_metadata_shape_mismatch_raises():
    a = _traj(2).replace(metadata={"k": jnp.zeros((2, 3))})
    b = _traj(2).replace(metadata={"k": jnp.zeros((2, 4))})
    with pytest.raises(ValueError, match="mismatched shapes"):
        SimulatorTrajectory.concat([a, b])


def test_concat_three_way_order():
    parts = [_traj(1, seed=s) for s in range(3)]
    c = SimulatorTrajectory.concat(parts)
    for k, p in enumerate(parts):
        np.testing.assert_array_equal(np.asarray(c.center[k]), np.asarray(p.center[0]))


# -- writer -----------------------------------------------------------------------


def test_to_file_oxdna_roundtrip(tmp_path):
    import mythos_tpu.io.trajectory as traj_io

    t = _traj(2, n=4, box=[20.0, 20.0, 20.0])
    p = tmp_path / "t.dat"
    t.to_file(p)
    back = traj_io.from_file(p, [4], is_5p_3p=False)
    assert len(back.states) == 2
    np.testing.assert_allclose(
        back.states[0].array[:, :3], np.asarray(t.center[0]), atol=1e-5
    )
