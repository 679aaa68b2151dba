"""InteractivePlayer: deterministic control-surface tests (no TTY).

Covers the reference Qt player's control signals (mainwindow.cpp:6-206):
play/pause, speed, loop, slider seek, stop-region skip — driven
programmatically through PlayerControls."""

import threading
import time

import numpy as np

from noetic_slam_tpu.io.player import InteractivePlayer


class FakeDataset:
    def __init__(self, n=50, dt=0.01):
        self.stamps = np.arange(n) * dt

    def events(self):
        return iter([(float(t), "scan", i)
                     for i, t in enumerate(self.stamps)])


def collect_player(ds, **kw):
    got = []
    p = InteractivePlayer(ds, lambda s, k, i: got.append((s, k, i)), **kw)
    return p, got


def test_unpaced_dispatch_order():
    ds = FakeDataset()
    p, got = collect_player(ds, rate=0.0)
    stats = p.run()
    assert stats["n_events"] == 50
    assert [g[2] for g in got] == list(range(50))


def test_pacing_speed():
    ds = FakeDataset(n=20, dt=0.01)           # 0.19 s of data
    p, _ = collect_player(ds, rate=4.0)       # ~0.05 s at 4x
    t0 = time.perf_counter()
    p.run()
    el = time.perf_counter() - t0
    assert el < 0.15                          # much faster than real time
    assert el > 0.02                          # but actually paced


def test_pause_resume_thread():
    ds = FakeDataset(n=30, dt=0.02)
    p, got = collect_player(ds, rate=1.0)
    p.controls.paused = True

    def driver():
        time.sleep(0.15)
        n_during_pause = len(got)
        p.controls.rate = 64.0
        p.controls.toggle_pause()             # resume fast
        assert n_during_pause == 0

    th = threading.Thread(target=driver)
    th.start()
    stats = p.run()
    th.join()
    assert stats["n_events"] == 30


def test_seek_slider():
    ds = FakeDataset(n=100, dt=0.01)
    seeks = []
    p = InteractivePlayer(ds, lambda s, k, i: None, rate=0.0,
                          on_seek=seeks.append)
    p.controls.seek(0.5)
    stats = p.run()
    # started at the halfway slider position
    assert stats["n_events"] == 50 + 1 or stats["n_events"] == 50
    assert seeks and abs(seeks[0] - 0.495) < 0.02


def test_loop_mode():
    ds = FakeDataset(n=10, dt=0.001)
    loops = []
    p = InteractivePlayer(ds, lambda s, k, i: None, rate=0.0, loop=True,
                          on_loop=lambda: loops.append(1))
    stats = p.run(max_events=25)
    assert stats["n_events"] == 25
    assert len(loops) == 2


def test_skip_stop_region():
    ds = FakeDataset(n=100, dt=0.01)
    p, got = collect_player(ds, rate=0.0,
                            skip_stop_region=(0.25, 0.50))
    p.run()
    stamps = [g[0] for g in got]
    assert not any(0.25 <= s <= 0.50 for s in stamps)
    assert len(got) == 100 - 26


def test_quit_stops():
    ds = FakeDataset(n=1000, dt=0.0)
    p = InteractivePlayer(ds, lambda s, k, i: (p.controls.stop()
                                               if i == 5 else None),
                          rate=0.0)
    stats = p.run()
    assert stats["n_events"] <= 7
