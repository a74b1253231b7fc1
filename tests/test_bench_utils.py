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
