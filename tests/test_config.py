from spatialvla_tpu.config import (
    SpatialVLAConfig,
    spatialvla_4b,
    spatialvla_tiny,
)


def test_json_round_trip():
    cfg = spatialvla_4b()
    cfg2 = SpatialVLAConfig.from_json(cfg.to_json())
    assert cfg == cfg2


def test_flagship_shapes():
    cfg = spatialvla_4b()
    assert cfg.num_image_tokens == 256
    assert cfg.vision.num_patches == 256
    assert cfg.text.q_per_kv == 2
    assert cfg.text.vocab_size == 257152 + 8194
    assert cfg.spatial_token_num == 8194


def test_tiny_is_consistent():
    cfg = spatialvla_tiny()
    assert cfg.text.num_heads % cfg.text.num_kv_heads == 0
    assert cfg.vision.hidden_size % cfg.vision.num_heads == 0
    cfg2 = SpatialVLAConfig.from_json(cfg.to_json())
    assert cfg2 == cfg
