"""Golden tests of the numpy trajectory transforms against the reference TF
implementations (executed read-only as oracles)."""
import sys
import types

import numpy as np
import pytest

from spatialvla_tpu.data import transforms as T

tf = pytest.importorskip("tensorflow")

REF_DATA = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    # data_utils imports dlimp at module level but the functions we test
    # don't touch it — stub it out
    if "dlimp" not in sys.modules:
        dl = types.ModuleType("dlimp")
        dl.transforms = types.SimpleNamespace()
        dl.DLataset = object
        sys.modules["dlimp"] = dl
    sys.path.insert(0, REF_DATA)
    import data.traj_transforms as ref_traj
    import data.utils.data_utils as ref_utils

    yield types.SimpleNamespace(traj=ref_traj, utils=ref_utils)
    sys.path.remove(REF_DATA)


def _np(tree):
    if isinstance(tree, dict):
        return {k: _np(v) for k, v in tree.items()}
    if isinstance(tree, tf.Tensor):
        return tree.numpy()
    return np.asarray(tree)


def _make_traj(rng, T_len=9, D=7):
    return {
        "observation": {
            "image_primary": rng.randint(0, 255, (T_len, 4, 4, 3)).astype(np.uint8),
            "proprio": rng.randn(T_len, 8).astype(np.float32),
            "timestep": np.arange(T_len, dtype=np.int32),
        },
        "task": {"timestep": np.full((T_len,), T_len - 3, dtype=np.int32)},
        "action": rng.randn(T_len, D).astype(np.float32),
        "absolute_action_mask": np.tile(
            np.array([[False] * 6 + [True]]), (T_len, 1)
        ),
    }


@pytest.mark.parametrize("back,delta,fwd", [(0, 1, 3), (1, 1, 0), (2, 2, 4)])
def test_chunk_act_obs_parity(ref, back, delta, fwd):
    rng = np.random.RandomState(0)
    traj_np = _make_traj(rng)
    traj_tf = {
        "observation": {k: tf.constant(v) for k, v in traj_np["observation"].items()},
        "task": {k: tf.constant(v) for k, v in traj_np["task"].items()},
        "action": tf.constant(traj_np["action"]),
        "absolute_action_mask": tf.constant(traj_np["absolute_action_mask"]),
    }
    got = T.chunk_act_obs(
        {k: (dict(v) if isinstance(v, dict) else v) for k, v in traj_np.items()},
        backward_window_size=back, backward_delta=delta, forward_window_size=fwd,
    )
    want = _np(
        ref.traj.chunk_act_obs(
            traj_tf, backward_windows_size=back, backward_delta=delta,
            forward_window_size=fwd,
        )
    )
    np.testing.assert_array_equal(got["action"], want["action"])
    np.testing.assert_array_equal(
        got["observation"]["pad_mask"], want["observation"]["pad_mask"]
    )
    for k in ("image_primary", "proprio", "timestep"):
        np.testing.assert_array_equal(got["observation"][k], want["observation"][k])


def test_binarize_gripper_parity(ref):
    cases = [
        np.array([1.0, 0.9, 0.5, 0.02, 0.0, 0.4, 1.0], np.float32),
        np.array([0.5, 0.5, 0.5], np.float32),  # never decisive
        np.array([0.0, 0.5, 0.5], np.float32),  # ends in-between
        np.random.RandomState(0).rand(31).astype(np.float32),
    ]
    for a in cases:
        want = ref.utils.binarize_gripper_actions(tf.constant(a)).numpy()
        got = T.binarize_gripper_actions(a)
        np.testing.assert_allclose(got, want, err_msg=str(a))


def test_rel2abs_gripper_parity(ref):
    cases = [
        np.array([0.0, 0.0, 1.0, 0.0, -1.0, 0.0], np.float32),
        np.array([-1.0, 0.0, 0.0, 1.0], np.float32),
        np.array([0.0, 0.0, 0.0], np.float32),  # no impulses
        (np.random.RandomState(1).rand(25) * 2 - 1).astype(np.float32),
    ]
    for a in cases:
        want = ref.utils.rel2abs_gripper_actions(tf.constant(a)).numpy()
        got = T.rel2abs_gripper_actions(a)
        np.testing.assert_allclose(got, want, err_msg=str(a))


def test_relabel_bridge_actions_parity(ref):
    rng = np.random.RandomState(2)
    traj = {
        "observation": {"state": rng.randn(8, 7).astype(np.float32)},
        "action": rng.randn(8, 7).astype(np.float32),
    }
    traj_tf = {
        "observation": {"state": tf.constant(traj["observation"]["state"])},
        "action": tf.constant(traj["action"]),
    }
    got = T.relabel_bridge_actions({k: dict(v) if isinstance(v, dict) else v for k, v in traj.items()})
    want = _np(ref.utils.relabel_bridge_actions(traj_tf))
    np.testing.assert_allclose(got["action"], want["action"], rtol=1e-6)
    np.testing.assert_allclose(
        got["observation"]["state"], want["observation"]["state"]
    )


def test_normalize_bounds_q99():
    rng = np.random.RandomState(3)
    traj = {"action": rng.randn(10, 7).astype(np.float32) * 3,
            "observation": {}}
    md = {
        "action": {
            "q01": np.full(7, -2.0), "q99": np.full(7, 2.0),
            "min": np.full(7, -5.0), "max": np.full(7, 5.0),
            "mask": np.array([True] * 6 + [False]),
        }
    }
    out = T.normalize_action_and_proprio(dict(traj), md, "bounds_q99")
    a = out["action"]
    assert a[:, :6].min() >= -1 and a[:, :6].max() <= 1
    np.testing.assert_array_equal(a[:, 6], traj["action"][:, 6])  # unmasked dim
    # zero-width dim -> 0
    md["action"]["min"][0] = md["action"]["max"][0] = 1.0
    out = T.normalize_action_and_proprio(dict(traj), md, "bounds_q99")
    np.testing.assert_array_equal(out["action"][:, 0], 0.0)


def test_uniform_goal_relabel_bounds():
    rng = np.random.default_rng(0)
    traj = {
        "observation": {"image_primary": np.arange(10)[:, None]},
        "task": {},
        "action": np.zeros((10, 7)),
    }
    out = T.uniform_goal_relabel(traj, rng)
    goals = out["task"]["image_primary"][:, 0]
    idx = np.arange(10)
    assert (goals >= np.minimum(idx + 1, 9)).all() and (goals <= 9).all()


def test_pad_mask_dict_strings():
    traj = {
        "observation": {"proprio": np.zeros((3, 8))},
        "task": {"language_instruction": np.array(["pick", "", "place"])},
        "action": np.zeros((3, 7)),
    }
    out = T.add_pad_mask_dict(traj)
    np.testing.assert_array_equal(
        out["task"]["pad_mask_dict"]["language_instruction"], [True, False, True]
    )
    np.testing.assert_array_equal(
        out["observation"]["pad_mask_dict"]["proprio"], [True] * 3
    )
