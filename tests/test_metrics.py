"""MetricTracker accumulation semantics (train/metrics.py)."""

from sniper_tpu.train.metrics import MetricTracker


def test_running_means_and_max_keys():
    t = MetricTracker()
    t.update({"loss": 2.0, "offset_max": 0.1}, n_samples=4)
    t.update({"loss": 4.0, "offset_max": 0.5}, n_samples=4)
    t.update({"loss": 3.0, "offset_max": 0.2}, n_samples=4)
    m = t.means()
    # plain keys: running mean
    assert abs(m["loss"] - 3.0) < 1e-9
    # *_max keys: running MAX (a mean would hide a transient spike into
    # the deformable head's margin halo)
    assert m["offset_max"] == 0.5
    line = t.format(epoch=1, step=60)
    assert "loss=3.00000" in line and "offset_max=0.50000" in line


def test_reset_clears_state():
    t = MetricTracker()
    t.update({"loss": 1.0, "offset_max": 9.0})
    t.reset()
    t.update({"loss": 5.0, "offset_max": 0.25})
    m = t.means()
    assert m["loss"] == 5.0 and m["offset_max"] == 0.25
