#!/usr/bin/env python
"""Download the CMU mocap trials used by the walk/run experiments.

The CMU Graphics Lab Motion Capture Database (mocap.cs.cmu.edu) is free for
all uses but not redistributable inside this repo, so — like the reference
(README.md:24) — the data must be fetched by the user.  This script pulls
exactly the subjects/trials in the registry (gpmdm_tpu/data/registry.py)
into ``<repo>/mocap/subjects/<SS>/`` in the layout the registry expects.

Usage:  python tools/fetch_cmu.py [--dest mocap]

(Requires network access; in an offline environment, place the .asf/.amc
files manually in the same layout.)
"""

from __future__ import annotations

import argparse
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from gpmdm_tpu.data import registry

BASE = "http://mocap.cs.cmu.edu/subjects"


def fetch(url: str, dest: Path) -> bool:
    if dest.exists():
        print(f"  have {dest}")
        return True
    try:
        dest.parent.mkdir(parents=True, exist_ok=True)
        with urllib.request.urlopen(url, timeout=60) as r:
            dest.write_bytes(r.read())
        print(f"  got  {dest}")
        return True
    except Exception as e:
        print(f"  FAIL {url}: {e}")
        return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest", default=str(Path(__file__).resolve().parents[1] / "mocap"))
    args = ap.parse_args()
    root = Path(args.dest)

    pairs = set()
    for ids in (registry.WALK_TRIAL_IDS, registry.RUN_TRIAL_IDS):
        for subject, trials in ids.items():
            for trial in trials:
                pairs.add((subject, trial))

    ok = True
    subjects = sorted({s for s, _ in pairs})
    for s in subjects:
        ss = str(s).zfill(2)
        ok &= fetch(f"{BASE}/{ss}/{ss}.asf", root / "subjects" / ss / f"{ss}.asf")
    for s, t in sorted(pairs):
        ss, tt = str(s).zfill(2), str(t).zfill(2)
        ok &= fetch(
            f"{BASE}/{ss}/{ss}_{tt}.amc", root / "subjects" / ss / f"{ss}_{tt}.amc"
        )
    print("done" if ok else "completed with failures")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
