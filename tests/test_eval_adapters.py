"""Eval adapter tests with a mocked policy (no simulators required)."""
import numpy as np

from spatialvla_tpu.eval import (
    LiberoPolicyAdapter,
    SimplerEnvPolicyAdapter,
    euler_to_axis_angle,
)


class FakePolicy:
    def __init__(self, gripper_seq):
        self.gripper_seq = list(gripper_seq)
        self.calls = 0

    def predict(self, image, instruction, unnorm_key=None):
        self.calls += 1
        chunk = np.zeros((2, 7))
        chunk[:, 0] = 0.01  # dx
        for i in range(2):
            chunk[i, 6] = self.gripper_seq.pop(0) if self.gripper_seq else 1.0
        return {"actions": chunk, "action_ids": np.zeros((2, 3), np.int64)}


def test_axis_angle_identity():
    np.testing.assert_allclose(euler_to_axis_angle(np.zeros(3)), np.zeros(3), atol=1e-8)
    aa = euler_to_axis_angle(np.array([0.0, 0.0, np.pi / 2]))
    np.testing.assert_allclose(aa, [0, 0, np.pi / 2], atol=1e-6)


def test_simpler_env_adapter_chunking_and_gripper():
    policy = FakePolicy([1.0, 1.0, 0.0, 0.0])
    ad = SimplerEnvPolicyAdapter(policy, policy_setup="widowx_bridge")
    ad.reset("pick")
    img = np.zeros((8, 8, 3), np.uint8)
    raw, a1 = ad.step(img)
    assert policy.calls == 1
    raw, a2 = ad.step(img)
    assert policy.calls == 1  # chunk reused
    raw, a3 = ad.step(img)
    assert policy.calls == 2  # new chunk
    assert a1["gripper"][0] == 1.0   # open fraction 1.0 -> +1
    assert a3["gripper"][0] == -1.0  # 0.0 -> -1
    assert a1["world_vector"].shape == (3,)
    assert a1["rot_axangle"].shape == (3,)


def test_google_robot_sticky_gripper():
    # absolute open->close transition must emit a sustained relative command
    policy = FakePolicy([1.0, 1.0, 0.0, 0.0, 0.0, 0.0])
    ad = SimplerEnvPolicyAdapter(policy, policy_setup="google_robot", sticky_steps=3)
    ad.reset("move")
    img = np.zeros((8, 8, 3), np.uint8)
    rels = []
    for _ in range(6):
        _, a = ad.step(img)
        rels.append(float(a["gripper"][0]))
    assert rels[0] == 0.0  # no previous state
    assert rels[1] == 0.0  # open -> open
    assert rels[2] == 2.0  # open -> close transition (sticky starts)
    assert rels[3] == 2.0 and rels[4] == 2.0  # sticky holds
    assert rels[5] == 0.0  # sticky released


def test_libero_adapter_gripper_convention():
    policy = FakePolicy([1.0, 0.0])
    ad = LiberoPolicyAdapter(policy)
    img = np.zeros((8, 8, 3), np.uint8)
    a1 = ad.step(img, "task")
    a2 = ad.step(img, "task")
    assert a1[6] == -1.0  # open
    assert a2[6] == 1.0   # close
    assert a1.shape == (7,)
