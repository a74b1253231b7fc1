"""Unit tests for the bench/evidence utilities (pure host-side logic)."""
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from tools import export_fps_evidence  # noqa: E402


class TestCollectiveBytes:
    def test_parses_all_reduce_and_tuple(self):
        hlo = "\n".join([
            "  %x = f32[256,128]{1,0} all-reduce(f32[256,128]{1,0} %a), replica_groups={}",
            "  %y = (f32[64]{0}, bf16[32]{0}) all-reduce(f32[64]{0} %b, bf16[32]{0} %c)",
            "  %z = f32[8]{0} add(f32[8]{0} %d, f32[8]{0} %e)",
        ])
        out = bench.collective_bytes(hlo)
        assert out["all-reduce"]["count"] == 2
        assert out["all-reduce"]["bytes"] == 256 * 128 * 4 + 64 * 4 + 32 * 2
        assert "all-gather" not in out

    def test_async_pairs_counted_once(self):
        hlo = "\n".join([
            "  %s = f32[100]{0} all-gather-start(f32[50]{0} %a)",
            "  %d = f32[100]{0} all-gather-done(f32[100]{0} %s)",
        ])
        out = bench.collective_bytes(hlo)
        assert out["all-gather"]["count"] == 1
        assert out["all-gather"]["bytes"] == 400

    def test_scalar_and_empty(self):
        assert bench.collective_bytes("") == {}
        out = bench.collective_bytes("  %p = pred[] all-reduce(pred[] %a)")
        assert out["all-reduce"]["bytes"] == 1


class TestRoofline:
    def test_latency_label(self):
        class FakeCompiled:
            def cost_analysis(self):
                return {"flops": 1e9, "bytes accessed": 1e9}

        class Dev:
            device_kind = "TPU v5 lite"

        r = bench.roofline(FakeCompiled(), 1.0, Dev())  # 1 call/s: tiny utils
        assert r["bound"] == "latency"
        r = bench.roofline(FakeCompiled(), 100000.0, Dev())  # 100k calls/s
        assert r["bound"] in ("compute", "bandwidth")
        assert r["mfu"] > 0.05 or r["hbm_util"] > 0.05


class TestFpsEvidence:
    def test_steady_fps_trims_and_skips_first(self):
        rows = [{"time/fps": 1.0}] + [{"time/fps": 100.0 + i} for i in range(10)]
        s = export_fps_evidence.steady_fps(rows)
        assert s["n"] == 10
        assert 100.0 <= s["mean_trimmed"] <= 110.0  # iteration 0 excluded
        assert s["min"] >= 100.0

    def test_export_roundtrip(self, tmp_path):
        run = tmp_path / "run"
        run.mkdir()
        (run / "config.json").write_text(json.dumps({
            "env": {"camera": {"height": 128, "width": 128},
                    "renderer": {"band_split": None}, "num_envs": 4}}))
        with open(run / "metrics.jsonl", "w") as f:
            for i in range(3):
                f.write(json.dumps({"step": i + 1, "time/fps": 50.0 + i,
                                    "time/iter_seconds": 1.0}) + "\n")
        # redirect the reports root into tmp
        old_root = export_fps_evidence.ROOT
        export_fps_evidence.ROOT = str(tmp_path)
        try:
            out = export_fps_evidence.export(str(run), "unit")
        finally:
            export_fps_evidence.ROOT = old_root
        payload = json.loads(open(os.path.join(out, "fps.json")).read())
        assert payload["summary"]["n"] == 2
        assert payload["camera"]["height"] == 128
        assert len(payload["iterations"]) == 3


class _Recorder:
    """File-like stream that timestamps writes into a shared event log, so
    the test can assert ordering between prints and bench legs."""

    def __init__(self, events):
        self.events = events
        self.lines = []

    def write(self, s):
        if s.strip():
            self.events.append(("print", s.strip()))
            self.lines.append(s.strip())

    def flush(self):
        self.events.append(("flush", None))


def _args(**kw):
    import argparse
    base = dict(iters=1, skip_400=False, budget_400=1500.0)
    base.update(kw)
    return argparse.Namespace(**base)


class TestEmitTimeoutProof:
    """bench.emit must never lose the 128^2 headline to a slow/broken 400^2
    leg (VERDICT r4: BENCH_r04.json rc=124, parsed null)."""

    @staticmethod
    def _fake_bench(events, on_400=None):
        def fn(camera, iters, phases=True):
            events.append(("bench", camera))
            if camera == 400 and on_400 is not None:
                return on_400()
            return {"value": 1000.0 + camera, "camera": camera}
        return fn

    def test_headline_flushed_before_400_leg_starts(self):
        events = []
        out = _Recorder(events)
        bench.emit(self._fake_bench(events), _args(), out=out)
        # a kill any time during the 400 leg still leaves the headline:
        first_print = events.index(("print", out.lines[0]))
        leg_400 = events.index(("bench", 400))
        assert first_print < leg_400, "headline must be printed first"
        assert ("flush", None) in events[first_print:leg_400]
        # both emitted lines parse; last line carries the merged result
        assert len(out.lines) == 2
        head = json.loads(out.lines[0])
        assert head["value"] == 1128.0 and "camera400" not in head
        merged = json.loads(out.lines[1])
        assert merged["camera400"]["value"] == 1400.0
        assert merged["value"] == 1128.0

    def test_400_exception_degrades_to_error_field(self):
        events = []
        out = _Recorder(events)

        def boom():
            raise RuntimeError("tunnel died")

        bench.emit(self._fake_bench(events, on_400=boom), _args(), out=out)
        assert json.loads(out.lines[0])["value"] == 1128.0
        assert "tunnel died" in json.loads(out.lines[1])["camera400"]["error"]

    def test_exhausted_budget_skips_400_leg(self):
        events = []
        out = _Recorder(events)
        bench.emit(self._fake_bench(events), _args(budget_400=0.0), out=out)
        assert ("bench", 400) not in events
        assert "skipped" in json.loads(out.lines[1])["camera400"]

    def test_sigalrm_aborts_overlong_400_leg(self, monkeypatch):
        import time as _time
        events = []
        out = _Recorder(events)

        def slow():
            _time.sleep(30)  # would blow the budget; alarm must cut it
            return {"value": -1.0}

        # lower the start-worthiness floor so the 1 s budget reaches the
        # alarm path instead of the early skip
        monkeypatch.setattr(bench, "MIN_400_BUDGET", 0.0)
        t0 = _time.perf_counter()
        bench.emit(self._fake_bench(events, on_400=slow),
                   _args(budget_400=1.0), out=out)
        assert _time.perf_counter() - t0 < 10, "alarm did not fire"
        assert ("bench", 400) in events  # the leg really started
        assert json.loads(out.lines[0])["value"] == 1128.0
        assert "skipped" in json.loads(out.lines[1])["camera400"]

    def test_skip_400_prints_single_headline(self):
        events = []
        out = _Recorder(events)
        bench.emit(self._fake_bench(events), _args(skip_400=True), out=out)
        assert len(out.lines) == 1
        assert json.loads(out.lines[0])["value"] == 1128.0
