"""The bench's steal-aware host calibration (r16 optimization round):
pure-arithmetic pins for _host_weather so the recorded steal/busy
percentages stay trustworthy round over round."""

import bench


def test_host_weather_computes_steal_and_busy_pct():
    # user nice system idle iowait irq softirq steal
    before = [100, 0, 100, 700, 50, 0, 0, 50]
    after = [200, 0, 200, 1200, 100, 0, 0, 300]
    # deltas: user 100, system 100, idle 500, iowait 50, steal 250 -> total 1000
    hw = bench._host_weather(before, after)
    assert hw == {"steal_pct": 25.0, "busy_pct": 20.0}


def test_host_weather_degrades_to_none():
    ok = [100, 0, 100, 700, 50, 0, 0, 50]
    assert bench._host_weather(None, ok) is None
    assert bench._host_weather(ok, None) is None
    assert bench._host_weather(ok, ok) is None  # zero-width window


def test_host_weather_tolerates_short_vectors():
    # pre-2.6.11 kernels had no steal field; treat missing as zero
    before = [100, 0, 100, 700]
    after = [200, 0, 200, 1200]
    hw = bench._host_weather(before, after)
    assert hw == {"steal_pct": 0.0, "busy_pct": 28.57}


def test_read_proc_stat_shape():
    js = bench._read_proc_stat()
    if js is not None:  # Linux
        assert len(js) >= 8 and all(isinstance(x, int) for x in js)
