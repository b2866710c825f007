"""The first-party TensorBoard event writer (train/tb_writer.py), verified
with TensorBoard's own event-file loader as the oracle."""
import math

import pytest

from spatialvla_tpu.train.tb_writer import SummaryWriter

tb_loader = pytest.importorskip(
    "tensorboard.backend.event_processing.event_file_loader"
)


def _scalar(v):
    # the loader's data_compat pass upgrades simple_value into the tensor
    # representation; accept either
    if v.HasField("tensor"):
        return v.tensor.float_val[0]
    return v.simple_value


def test_tb_events_readable_by_tensorboard(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalars(1, {"loss": 2.5, "accuracy": 0.125})
    w.add_scalar("loss", 1.75, step=2)
    w.close()

    events = list(tb_loader.EventFileLoader(w.path).Load())
    assert events[0].file_version == "brain.Event:2"

    scalars = {}
    for ev in events[1:]:
        for v in ev.summary.value:
            scalars[(ev.step, v.tag)] = _scalar(v)
    assert scalars[(1, "loss")] == 2.5
    assert scalars[(1, "accuracy")] == 0.125
    assert scalars[(2, "loss")] == 1.75
    assert all(math.isfinite(v) for v in scalars.values())


def test_trainer_writes_tb_events(tmp_path):
    from spatialvla_tpu.train.trainer import MetricsLogger

    logger = MetricsLogger(str(tmp_path), tensorboard=True)
    logger.log(10, {"loss": 3.0, "lr": 1e-4}, echo=False)
    logger.close()

    import glob

    files = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert len(files) == 1
    events = list(tb_loader.EventFileLoader(files[0]).Load())
    got = {
        (ev.step, v.tag): _scalar(v)
        for ev in events
        for v in ev.summary.value
    }
    assert got[(10, "loss")] == 3.0
    assert got[(10, "lr")] == pytest.approx(1e-4)
