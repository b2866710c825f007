"""Closed-loop smoke with the REAL tiny policy (not a mock): the full
SimplerEnv-adapter chain — processor -> greedy generate -> decode_actions ->
gripper-convention mapping -> chunk queue — driven by a minimal fake env
for several episodes. The reference's closed-loop eval lives out-of-repo
(SimplerEnv fork, README.md:154-161); this pins the policy side of that
interface end-to-end."""
import numpy as np
import pytest

from tests.test_hf_checkpoint import _build_reference_style_checkpoint


@pytest.fixture(scope="module")
def policy(tmp_path_factory):
    from spatialvla_tpu.inference import SpatialVLAPolicy

    d = tmp_path_factory.mktemp("ckpt")
    _build_reference_style_checkpoint(d)
    return SpatialVLAPolicy.from_hf_checkpoint(str(d), param_dtype=None)


def test_simpler_env_closed_loop(policy):
    from spatialvla_tpu.eval import SimplerEnvPolicyAdapter

    adapter = SimplerEnvPolicyAdapter(
        policy, unnorm_key="bridge_orig/1.0.0", policy_setup="widowx_bridge"
    )
    rng = np.random.RandomState(0)
    for episode in range(2):
        adapter.reset("pick up the green block")
        for t in range(5):
            image = (rng.rand(64, 80, 3) * 255).astype(np.uint8)
            raw_action, action = adapter.step(image, "pick up the green block")
            assert np.asarray(raw_action).shape == (7,)
            assert action["world_vector"].shape == (3,)
            assert action["rot_axangle"].shape == (3,)
            assert np.isfinite(action["world_vector"]).all()
            assert np.isfinite(action["rot_axangle"]).all()
            assert action["gripper"].shape == (1,)
            # bridge setup maps [0,1] open-fraction into the env's +-1 range
            assert -1.0 - 1e-6 <= float(action["gripper"][0]) <= 1.0 + 1e-6


def test_libero_closed_loop(policy):
    from spatialvla_tpu.eval import LiberoPolicyAdapter

    adapter = LiberoPolicyAdapter(policy, unnorm_key="bridge_orig/1.0.0")
    rng = np.random.RandomState(1)
    adapter.reset()
    for t in range(4):
        image = (rng.rand(64, 80, 3) * 255).astype(np.uint8)
        act = adapter.step(image, "put the bowl on the plate")
        act = np.asarray(act)
        assert act.shape == (7,)
        assert np.isfinite(act).all()
