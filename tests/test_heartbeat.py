"""Liveness monitoring (SURVEY.md §5 failure-detection obligation).

Host-side only — no JAX imports, so these run independent of any backend.
"""

import threading
import time

from edrgp_tpu.parallel.heartbeat import (StallWatchdog, read_heartbeats,
                                          stale_peers, write_heartbeat)


def test_watchdog_fires_on_stall():
    fired = threading.Event()
    seen = {}

    def on_stall(silent, step):
        seen["silent"], seen["step"] = silent, step
        fired.set()

    with StallWatchdog(timeout_s=0.2, poll_s=0.05, on_stall=on_stall) as dog:
        dog.beat(7)
        assert fired.wait(timeout=2.0)
    assert dog.fired
    assert seen["step"] == 7
    assert seen["silent"] >= 0.2


def test_watchdog_quiet_while_beating():
    with StallWatchdog(timeout_s=0.4, poll_s=0.05) as dog:
        for step in range(8):
            time.sleep(0.05)
            dog.beat(step)
    assert not dog.fired


def test_watchdog_stop_idempotent():
    dog = StallWatchdog(timeout_s=10.0).start()
    dog.stop()
    dog.stop()
    assert not dog.fired


def test_heartbeat_files_roundtrip(tmp_path):
    d = str(tmp_path / "hb")
    write_heartbeat(d, 0, step=12)
    write_heartbeat(d, 1, step=12, payload={"elbo": -3.5})
    recs = read_heartbeats(d)
    assert set(recs) == {0, 1}
    assert recs[1]["elbo"] == -3.5
    assert stale_peers(d, timeout_s=60.0, expected=2) == []


def test_stale_peer_detection(tmp_path):
    d = str(tmp_path / "hb")
    now = time.time()
    write_heartbeat(d, 0, step=5)
    write_heartbeat(d, 1, step=2)
    # peer 1 last stamped 100 s "ago"
    import json, os
    path = os.path.join(d, "heartbeat-00001.json")
    rec = json.load(open(path))
    rec["time"] = now - 100.0
    json.dump(rec, open(path, "w"))
    assert stale_peers(d, timeout_s=30.0, now=now) == [1]
    # an expected peer that never stamped is stale too
    assert stale_peers(d, timeout_s=30.0, expected=3, now=now) == [1, 2]


def test_torn_heartbeat_ignored(tmp_path):
    d = str(tmp_path / "hb")
    write_heartbeat(d, 0)
    import os
    with open(os.path.join(d, "heartbeat-00009.json"), "w") as f:
        f.write('{"process_id": 9, "ti')  # torn write from a dying peer
    recs = read_heartbeats(d)
    assert set(recs) == {0}
