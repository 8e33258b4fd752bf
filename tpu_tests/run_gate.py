"""Run the compiled-Mosaic gate and record an auditable artifact.

    python tpu_tests/run_gate.py [--out TPU_TESTS_r3.json]

Runs ``pytest tpu_tests/`` on the real chip and writes a JSON artifact
{passed, failed, skipped, duration_s, timestamp, jax_backend} at the repo
root so each round's VERDICT can verify the gate actually ran
(VERDICT round 2 #8 — "a TPU_TESTS_r*.json-style artifact would make the
gate auditable")."""

from __future__ import annotations

import argparse
import datetime
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "TPU_TESTS_r3.json"))
    args = ap.parse_args()

    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", os.path.join(ROOT, "tpu_tests"),
         "-q", "--tb=line"],
        capture_output=True, text=True)
    dur = time.time() - t0
    tail = "\n".join(proc.stdout.strip().splitlines()[-15:])
    counts = {k: 0 for k in ("passed", "failed", "skipped", "error")}
    for num, kind in re.findall(r"(\d+) (passed|failed|skipped|error)",
                                proc.stdout):
        counts[kind] = int(num)

    artifact = {
        "ok": proc.returncode == 0 and counts["passed"] > 0,
        "returncode": proc.returncode,
        **counts,
        "duration_s": round(dur, 1),
        "timestamp": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "summary_tail": tail,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: artifact[k] for k in
                      ("ok", "passed", "failed", "skipped", "duration_s")}))
    return 0 if artifact["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
