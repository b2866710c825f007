"""Golden-parity tests for the spatial action tokenizer against the
reference implementation at /root/reference/model/action_tokenizer.py,
executed (read-only) as an oracle."""
import json
import sys

import numpy as np
import pytest

from spatialvla_tpu.action import (
    DEFAULT_NUM_BINS,
    SpatialActionTokenizer,
    UniformActionTokenizer,
    gaussian_bin_policy,
    make_bin_policy,
    uniform_bin_policy,
)

REF_DIR = "/root/reference/model"
GS_BRIDGE = "/root/reference/scripts/gs_bridge.json"


class _FakeHFTokenizer:
    """Minimal duck-typed HF tokenizer for instantiating the reference
    tokenizer classes (they only use add_tokens/convert_tokens_to_ids)."""

    def __init__(self, base_size=1000):
        self._tok2id = {}
        self._base = base_size
        self.vocab_size = base_size

    def add_tokens(self, tokens, special_tokens=True):
        n = 0
        for t in tokens:
            if t not in self._tok2id:
                self._tok2id[t] = self._base + len(self._tok2id)
                n += 1
        return n

    def convert_tokens_to_ids(self, tok):
        return self._tok2id[tok]

    def __len__(self):
        return self._base + len(self._tok2id)


@pytest.fixture(scope="module")
def ref_mod():
    sys.path.insert(0, REF_DIR)
    import action_tokenizer as ref

    yield ref
    sys.path.remove(REF_DIR)


@pytest.fixture(scope="module")
def gs_params():
    with open(GS_BRIDGE) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def ref_tok(ref_mod, gs_params):
    return ref_mod.SpatialActionTokenizer(
        _FakeHFTokenizer(), num_bins=DEFAULT_NUM_BINS, gs_params=gs_params,
        use_spherical=True, min_sigma=0.0,
    )


@pytest.fixture(scope="module")
def our_tok(gs_params):
    return SpatialActionTokenizer(
        num_bins=DEFAULT_NUM_BINS, gs_params=gs_params, use_spherical=True,
        min_sigma=0.0, token_begin_idx=1000,
    )


def test_gaussian_bin_policy_matches_reference(ref_tok, gs_params):
    ours = gaussian_bin_policy(DEFAULT_NUM_BINS, gs_params, min_sigma=0.0)
    for bin_type in ("translation", "rotation"):
        for key, bounds in ref_tok.bin_policy[bin_type].items():
            np.testing.assert_allclose(
                ours[bin_type][key], bounds, rtol=1e-12, atol=1e-12,
                err_msg=f"{bin_type}/{key}")


def test_uniform_bin_policy_shapes():
    pol = uniform_bin_policy(DEFAULT_NUM_BINS)
    assert len(pol["translation"]["theta_bins"]) == 17
    assert len(pol["translation"]["phi_bins"]) == 33
    assert len(pol["translation"]["r_bins"]) == 9
    assert len(pol["rotation"]["roll_bins"]) == 17


def test_encode_parity(ref_tok, our_tok):
    rng = np.random.RandomState(0)
    actions = rng.uniform(-1.3, 1.3, size=(512, 7))  # includes out-of-range
    ref_tokens = ref_tok(actions)  # (n, 3) strings
    ref_ids = np.vectorize(lambda s: int(s[7:-1]))(ref_tokens)
    ours = our_tok.encode(actions)
    np.testing.assert_array_equal(ours, ref_ids)


def test_decode_parity(ref_tok, our_tok):
    rng = np.random.RandomState(1)
    n = 256
    local = np.stack(
        [
            rng.randint(0, our_tok.rotation_begin, n),
            rng.randint(our_tok.rotation_begin, our_tok.gripper_begin, n),
            rng.randint(our_tok.gripper_begin, our_tok.vocab_size, n),
        ],
        axis=1,
    )
    # reference decodes *global* tokenizer ids; its action block starts at
    # the fake tokenizer's base size (=1000)
    ref_actions = ref_tok.decode_token_ids_to_actions(local + 1000)
    ours = our_tok.decode(local)
    np.testing.assert_allclose(ours, ref_actions, rtol=1e-12, atol=1e-12)
    ours_global = our_tok.decode_global_ids(local + 1000)
    np.testing.assert_allclose(ours_global, ref_actions, rtol=1e-12, atol=1e-12)


def test_round_trip_within_bin_width(our_tok):
    rng = np.random.RandomState(2)
    actions = rng.uniform(-0.95, 0.95, size=(256, 7))
    actions[:, 6] = (actions[:, 6] > 0).astype(np.float64)
    ids = our_tok.encode(actions)
    decoded = our_tok.decode(ids)
    # re-encoding the decoded action must produce the same token ids
    # (idempotence of the quantizer on bin centers)
    ids2 = our_tok.encode(decoded)
    # translation re-encode can drift by the +-1-bin clip at the cartesian
    # boundary; rotation/gripper must be exactly stable
    np.testing.assert_array_equal(ids[:, 1:], ids2[:, 1:])
    # gripper exact
    np.testing.assert_allclose(decoded[:, 6], actions[:, 6])


def test_encode_strings(our_tok):
    a = np.zeros((1, 7))
    toks = our_tok.encode_to_strings(a)
    assert toks.shape == (1, 3)
    assert all(t.startswith("<ACTION") and t.endswith(">") for t in toks[0])


def test_uniform_action_tokenizer_parity(ref_mod):
    ref = ref_mod.ActionTokenizer(_FakeHFTokenizer(), num_bins=256)
    ours = UniformActionTokenizer(num_bins=256, token_begin_idx=1000)
    rng = np.random.RandomState(3)
    actions = rng.uniform(-1.2, 1.2, size=(64, 7))
    ref_tokens = ref(actions)
    ref_ids = np.vectorize(lambda s: int(s[7:-1]))(ref_tokens)
    np.testing.assert_array_equal(ours.encode(actions), ref_ids)
    ids = rng.randint(0, 256, size=(64, 7))
    np.testing.assert_allclose(
        ours.decode(ids), ref.decode_token_ids_to_actions(ids + 1000))


def test_adaptation_changes_policy_and_regrids(our_tok, gs_params):
    tok = SpatialActionTokenizer(num_bins=DEFAULT_NUM_BINS, gs_params=gs_params)
    rng = np.random.RandomState(4)
    emb = rng.randn(tok.vocab_size, 16).astype(np.float32)
    new_gs = {k: {"mu": v["mu"] * 0.5, "sigma": v["sigma"] * 2.0} for k, v in gs_params.items()}
    new_emb = tok.adapt_to_gaussian(new_gs, embeddings=emb)
    assert new_emb.shape == emb.shape
    assert np.isfinite(new_emb).all()
    # gripper rows untouched
    np.testing.assert_array_equal(new_emb[-2:], emb[-2:])
    # policy actually changed
    assert not np.allclose(
        tok.bin_policy["translation"]["theta_bins"],
        gaussian_bin_policy(DEFAULT_NUM_BINS, gs_params)["translation"]["theta_bins"],
    )


def test_vocab_layout():
    tok = SpatialActionTokenizer(num_bins=DEFAULT_NUM_BINS)
    assert tok.translation.vocab_size == 16 * 32 * 8 == 4096
    assert tok.rotation.vocab_size == 16**3 == 4096
    assert tok.gripper.vocab_size == 2
    assert tok.vocab_size == 8194
