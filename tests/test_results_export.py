"""collect_results: metrics.json reading + results/{tag} export round trip."""
import importlib.util
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _load_collect(monkeypatch, tag):
    monkeypatch.setattr(sys, "argv", ["collect_results.py", tag, "--export"])
    spec = importlib.util.spec_from_file_location(
        "collect_results", ROOT / "workspace/collect_results.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_export_builds_tracked_tree(monkeypatch, tmp_path, capsys):
    tag = "exporttest"
    mod = _load_collect(monkeypatch, tag)
    # fabricate two eval dirs the matrix knows about
    base = ROOT / "output/cfgs/v2x_sim_models"
    rows = [
        ("v2x_pointpillar_basic_ego", tag, "lately_sync",
         {"mAP": 0.945, "NDS": 0.91, "recall/rcnn_0.3": 0.97}),
        ("v2x_late_fusion", tag, "late_sync",
         {"mAP": 0.873, "NDS": 0.752, "recall/rcnn_0.3": 0.93}),
    ]
    made = []
    try:
        for cfg, t, etag, metrics in rows:
            d = base / cfg / t / "eval" / etag
            d.mkdir(parents=True, exist_ok=True)
            made.append(base / cfg / t)
            with open(d / "metrics.json", "w") as f:
                json.dump(metrics, f)
            (d / "log_eval_x.txt").write_text("log")
        monkeypatch.setattr(mod, "EXPORT", True)
        mod.main()
        out = capsys.readouterr().out
        assert "| lately fusion (MoDAR, ours) | 94.5 |" in out
        assert "| late fusion | 87.3 |" in out
        res = ROOT / "results" / tag
        assert (res / "matrix.md").exists() and (res / "matrix.json").exists()
        with open(res / "matrix.json") as f:
            table = json.load(f)
        assert table["late fusion"]["sync"]["mAP"] == 0.873
        exported = list(res.glob("*lately_sync*/metrics.json"))
        assert exported, "row artifacts not exported"
    finally:
        import shutil

        for d in made:
            shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ROOT / "results" / tag, ignore_errors=True)
