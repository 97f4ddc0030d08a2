"""CapacityController behavior (training/capacity.py) — the adaptive
entry-table multiplier that re-jits the raster step on power-of-two
changes. Locks in the round-2 review fixes: the 2^24 expand-kernel
clamp, and overflow breaking the shrink hysteresis."""

from dreamscene_tpu.training.capacity import CapacityController


def test_grow_on_overflow_and_shrink_hysteresis():
    c = CapacityController()
    n = 1000
    assert c.capacity(n) == 4000
    # heavy drop -> grow
    assert c.update(n, n_entries=4000, n_dropped=400) is True
    assert c.mult == 8
    # fitting steps accumulate toward a shrink
    for _ in range(c.shrink_patience - 1):
        assert c.update(n, n_entries=100, n_dropped=0) is False
    assert c.update(n, n_entries=100, n_dropped=0) is True
    assert c.mult == 4


def test_overflow_breaks_shrink_streak_even_at_max_mult():
    c = CapacityController(mult=16)
    n = 1000
    for _ in range(c.shrink_patience - 1):
        c.update(n, n_entries=100, n_dropped=0)
    # overflow at max_mult: no grow possible, but the streak must reset
    assert c.update(n, n_entries=16000, n_dropped=4000) is False
    assert c._fit_streak == 0
    # the next fitting step must NOT immediately shrink
    assert c.update(n, n_entries=100, n_dropped=0) is False
    assert c.mult == 16


def test_growth_clamped_to_expand_kernel_limit():
    c = CapacityController(mult=8)
    n = 1_100_000                      # 8x = 8.8M < 2^24, 16x would exceed
    assert c.capacity(n) <= c.HARD_CAP
    changed = c.update(n, n_entries=8 * n, n_dropped=n)
    assert changed is False            # growing would cross 2^24
    assert c.mult == 8
    assert c.capacity(n) < (1 << 24)


def test_snapshot_write_once_per_process(tmp_path):
    import yaml

    from dreamscene_tpu.utils.experiment import setup_experiment_logging

    cfg1 = {"seed": 1}
    cfg2 = {"seed": 2}
    setup_experiment_logging(tmp_path, cfg1)
    setup_experiment_logging(tmp_path, cfg2)   # per-object re-entry
    snap = yaml.safe_load(open(tmp_path / "config_snapshot.yaml"))
    assert snap == {"seed": 1}, "snapshot must record the run's FIRST config"
