"""CapacityController behavior (training/capacity.py) — the adaptive
entry-table multiplier that re-jits the raster step when the quantized
multiplier changes. Locks in the round-2 review fixes (the 2^24
expand-kernel clamp, overflow breaking the shrink hysteresis) and the
round-4 fine-grained tracking: the multiplier moves on an N/4 grid and
jumps DIRECTLY to the padded demand, so the capacity the step actually
runs at tracks raw entries instead of a powers-of-two ladder."""

from dreamscene_tpu.training.capacity import CapacityController


def test_grow_jumps_to_fit_and_shrink_hysteresis():
    c = CapacityController()
    n = 1000
    assert c.capacity(n) == 4000
    # heavy drop: demand 6400 raw -> 6400*1.1/1000 = 7.04 -> quantized 7.25
    assert c.update(n, n_entries=4000, n_dropped=2400) is True
    assert c.mult == 7.25
    # fitting steps accumulate toward a shrink to the padded peak
    for _ in range(c.shrink_patience - 1):
        assert c.update(n, n_entries=2000, n_dropped=0) is False
    assert c.update(n, n_entries=2000, n_dropped=0) is True
    assert c.mult == 2.25              # 2000*1.1/1000 quantized up


def test_small_overflow_grows_at_least_one_quantum():
    c = CapacityController()
    n = 1000
    # 20 dropped of 4020 raw (0.5% > grow_frac) but 4020*1.1/1000 = 4.42
    assert c.update(n, n_entries=4000, n_dropped=20) is True
    assert c.mult == 4.5


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


def test_shrink_tracks_peak_not_last_step():
    c = CapacityController(mult=8)
    n = 1000
    for i in range(c.shrink_patience - 1):
        # a 5000-raw spike mid-window must lift the shrink target
        c.update(n, n_entries=5000 if i == 3 else 2000, n_dropped=0)
    assert c.update(n, n_entries=2000, n_dropped=0) is True
    assert c.mult == 5.5               # 5000*1.1/1000 quantized up


def test_no_shrink_below_meaningful_gain():
    c = CapacityController(mult=4)
    n = 1000
    # demand 3500 -> target 3.85 -> quantized 4.0 == mult: never shrinks
    for _ in range(3 * c.shrink_patience):
        assert c.update(n, n_entries=3500, n_dropped=0) is False
    assert c.mult == 4


def test_growth_clamped_to_expand_kernel_limit():
    c = CapacityController(mult=8)
    n = 1_100_000                      # 8x = 8.8M < 2^24, 16x would exceed
    assert c.capacity(n) <= c.HARD_CAP
    changed = c.update(n, n_entries=8 * n, n_dropped=n)
    # grows as far as the 2^24 clamp allows (15.25x = 16.775M < 2^24)
    assert changed is True
    assert c.mult * n <= c.HARD_CAP
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
