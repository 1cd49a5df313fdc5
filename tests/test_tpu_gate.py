"""On-TPU Pallas regression gate (round-3 VERDICT weak #3).

CPU interpreter-mode tests cannot catch Mosaic lowering failures — round 2
shipped a kernel that failed `Invalid relayout` on the chip while all CPU
tests passed, zeroing the round's headline benchmark.  This test runs the
full on-chip compile smoke (scripts/pallas_smoke.py: every production
kernel, fwd AND bwd, production shapes) as a subprocess on the real TPU.

Opt-in (the suite pins itself to the CPU backend and the chip is exclusive —
a concurrent training run would serialize):

    MUPE_TPU_GATE=1 python -m pytest tests/test_tpu_gate.py -q

Run before any bench-affecting commit, per .claude/skills/verify/SKILL.md.
"""
import os
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("MUPE_TPU_GATE") != "1",
    reason="on-chip gate is opt-in: set MUPE_TPU_GATE=1 (needs exclusive TPU)",
)


def test_pallas_smoke_on_tpu():
    repo = Path(__file__).resolve().parent.parent
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    # compilation cache hangs axon compiles (verified) — never inherit it
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    proc = subprocess.run(
        [sys.executable, str(repo / "scripts" / "pallas_smoke.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    assert proc.returncode == 0, "pallas smoke failed on TPU"
    assert "SMOKE OK" in proc.stdout
