"""scripts/make_results.py: renders RESULTS.md + curve PNGs from run CSVs,
filtering episode stats to boundary rows (synchronized resets make
non-boundary stat means meaningless)."""
import csv
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_make_results_renders(tmp_path):
    run = tmp_path / "runs" / "fake"
    run.mkdir(parents=True)
    fields = [
        "env_frames", "stats/success", "stats/episode_count",
        "TP_loss", "rollout_fps",
    ]
    with open(run / "metrics.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        for i in range(20):
            w.writerow({
                "env_frames": i * 1000,
                # success only meaningful when episodes finished
                "stats/success": 0.5 if i % 5 == 0 else 0.0,
                "stats/episode_count": 128 if i % 5 == 0 else 0,
                "TP_loss": 1.0 / (i + 1),
                "rollout_fps": 1e5 + i,
            })
    (run / "config.json").write_text(json.dumps({"task": "X", "algo": "y"}))
    sweep = tmp_path / "sweep.json"
    sweep.write_text(json.dumps({
        "wall": {"success": 0.9, "first_capture_step": 120.0, "collision": 0.1}
    }))
    out = tmp_path / "RESULTS.md"
    imgdir = tmp_path / "imgs"
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "make_results.py"),
         str(run), "--eval", str(sweep), "--out", str(out),
         "--imgdir", str(imgdir)],
        capture_output=True, text=True, env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"},
    )
    assert r.returncode == 0, r.stderr
    text = out.read_text()
    # boundary filtering: success column keeps only the 4 nonzero rows,
    # so first == last == 0.5
    assert "| capture success rate (`stats/success`) | 0.5000 | 0.5000" in text
    assert "wall | 0.900" in text
    assert (imgdir / "fake.png").exists()
